"""CLI: python -m turbo_whisper_workspace_tpu <command>.

Rebuilds vocalis/__main__.py (`{api,ui,security}` at `:95-128`) and the
reference's root-script sidecar as subcommands: batch (the pod-scale
directory job), transcribe, info/diagnose (audio_diagnostics.py),
preprocess (dynamic_bar_audio.py/normalize_bar_audio.py), convert
(weight ingestion), models (check_models.py/download_models.py),
check-tpu (check_gpu.py).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
)


def run_api(args):
    from .serve.api import run_api_server

    run_api_server(args.host, args.port)


def run_ui(args):
    from .serve.ui import run_ui as _run

    _run(args.host, args.port)


def run_security(args):
    from .analysis import bar_security_monitor, security_monitor

    argv = ["--input", args.input, "--output", args.output,
            "--min-threat-level", str(args.min_threat_level)]
    if args.bar:
        bar_security_monitor.main(argv + (["--test"] if args.test else []))
    else:
        security_monitor.main(argv)


def run_batch(args):
    from .parallel.batch_driver import BatchDriver

    pipeline = None
    if args.model:
        from .config import PipelineConfig
        from .pipeline.audio_pipeline import get_pipeline

        config = PipelineConfig()
        config.transcription.model = args.model
        pipeline = get_pipeline(config)
    driver = BatchDriver(pipeline=pipeline, output_dir=args.output,
                         files_per_call=args.files_per_call)
    stats = driver.run_directory(args.input, num_speakers=args.num_speakers,
                                 enrich=not args.no_enrich)
    print(json.dumps(stats.to_dict(), indent=1))


def run_transcribe(args):
    from .config import PipelineConfig
    from .pipeline.audio_pipeline import get_pipeline

    config = PipelineConfig()
    if args.model:
        config.transcription.model = args.model
    if args.language:
        config.transcription.language = args.language
    if args.beam_size:
        config.transcription.beam_size = args.beam_size
    res = get_pipeline(config).process_audio(
        args.input, task=args.task, num_speakers=args.num_speakers,
        enrich=not args.no_enrich, initial_prompt=args.initial_prompt,
    )
    if args.json:
        print(json.dumps(res, indent=1, default=str))
    else:
        from .pipeline.diarizer import SpeakerDiarizer

        print(SpeakerDiarizer.format_as_conversation(res["merged_segments"]))
        if res.get("summary"):
            print("\n--- summary ---\n" + res["summary"])


def run_info(args):
    from .analysis.audio_info import get_audio_info

    print(json.dumps(get_audio_info(args.input), indent=1))


def run_diagnose(args):
    from .analysis.diagnostics import diagnose
    from .audio.io import read_audio_file

    audio, _ = read_audio_file(args.input)
    print(str(diagnose(audio)))


def run_preprocess(args):
    import numpy as np

    from .analysis import preprocess as pp
    from .audio.io import read_audio_file, write_wav

    audio, sr = read_audio_file(args.input, normalize=False)
    if args.denoise > 0:
        audio = pp.spectral_denoise(audio, strength=args.denoise)
    if args.dynamic:
        audio = pp.dynamic_normalize(audio, window_s=args.window,
                                     target_db=args.target_db)
    elif args.normalize:
        audio = pp.rms_normalize(audio, target_db=args.target_db)
    if args.effects:
        audio = pp.apply_audio_effects(audio)
    write_wav(args.output, np.asarray(audio), sr)
    print(f"wrote {args.output}")


def run_convert(args):
    import jax.numpy as jnp

    from .models import convert

    params, dims = convert.load_hf_snapshot(args.input, dtype=jnp.float32)
    convert.save_params(args.output, params)
    print(f"converted {args.input} -> {args.output} ({dims})")


def run_models(args):
    from .utils import registry

    if args.action == "check":
        print(json.dumps(registry.check_models(), indent=1))
    elif args.action == "list":
        print(json.dumps({
            "segmentation": registry.speaker_segmentation_models(),
            "embedding": registry.embedding2models(),
        }, indent=1))
    else:
        print(json.dumps(registry.download_models(), indent=1))


def run_eval(args):
    from .utils import evaluate

    argv = ["--audio", args.audio, "--num-speakers", str(args.num_speakers),
            "--collar", str(args.collar)]
    if args.ref:
        argv += ["--ref", args.ref]
    if args.rttm:
        argv += ["--rttm", args.rttm]
    if args.model:
        argv += ["--model", args.model]
    evaluate.main(argv)


def run_check_tpu(args):
    """Device probe + matmul microbenchmark (reference check_gpu.py)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    devs = jax.devices()
    print(f"devices: {devs}")
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    np.asarray(f(x))  # warm
    t0 = time.time()
    r = f(x)
    for _ in range(9):
        r = f(r)
    _ = np.asarray(jnp.sum(r))
    dt = time.time() - t0
    print(f"4096^3 bf16 matmul x10: {2 * 4096**3 * 10 / dt / 1e12:.1f} TFLOP/s")


def _apply_platform(platform: str | None):
    """Force the JAX platform before any backend initializes.

    A site-level customization may import jax at interpreter start and
    pin a remote accelerator platform, making the JAX_PLATFORMS env var
    too late — jax.config still works until the first backend init, so
    route both the --platform flag and the env var through it.
    """
    import os

    platform = platform or os.environ.get("JAX_PLATFORMS")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main(argv=None):
    p = argparse.ArgumentParser(prog="turbo_whisper_workspace_tpu")
    p.add_argument("--platform", default=None,
                   help="JAX platform override (cpu / tpu / axon)")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("api", help="run the HTTP API server")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    s.set_defaults(fn=run_api)

    s = sub.add_parser("ui", help="run the browser UI")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=7860)
    s.set_defaults(fn=run_ui)

    s = sub.add_parser("security", help="security-monitor a file/directory")
    s.add_argument("--input", "-i", required=True)
    s.add_argument("--output", "-o", default="security_incidents")
    s.add_argument("--min-threat-level", type=int, default=2)
    s.add_argument("--bar", action="store_true")
    s.add_argument("--test", action="store_true")
    s.set_defaults(fn=run_security)

    s = sub.add_parser("batch", help="batched directory transcription")
    s.add_argument("--input", "-i", required=True)
    s.add_argument("--output", "-o", default="batch_output")
    s.add_argument("--model", default=None,
                   help="whisper config name (tiny/base/.../large-v3-turbo)")
    s.add_argument("--num-speakers", type=int, default=0)
    s.add_argument("--files-per-call", type=int, default=8)
    s.add_argument("--no-enrich", action="store_true")
    s.set_defaults(fn=run_batch)

    s = sub.add_parser("transcribe", help="transcribe one file")
    s.add_argument("--input", "-i", required=True)
    s.add_argument("--task", default="transcribe",
                   choices=["transcribe", "translate"])
    s.add_argument("--model", default=None,
                   help="whisper config name (tiny/base/.../large-v3-turbo)")
    s.add_argument("--language", default=None,
                   help="force language (default: auto-detect)")
    s.add_argument("--beam-size", type=int, default=None,
                   help="beam width (default 1 = greedy)")
    s.add_argument("--initial-prompt", default=None,
                   help="condition decode on this text (<|startofprev|>)")
    s.add_argument("--num-speakers", type=int, default=2)
    s.add_argument("--no-enrich", action="store_true")
    s.add_argument("--json", action="store_true")
    s.set_defaults(fn=run_transcribe)

    s = sub.add_parser("info", help="audio file info")
    s.add_argument("--input", "-i", required=True)
    s.set_defaults(fn=run_info)

    s = sub.add_parser("diagnose", help="audio diagnostics report")
    s.add_argument("--input", "-i", required=True)
    s.set_defaults(fn=run_diagnose)

    s = sub.add_parser("preprocess", help="normalize/denoise/filter audio")
    s.add_argument("--input", "-i", required=True)
    s.add_argument("--output", "-o", required=True)
    s.add_argument("--normalize", action="store_true")
    s.add_argument("--dynamic", action="store_true",
                   help="rolling-window dynamic normalization")
    s.add_argument("--window", type=float, default=30.0)
    s.add_argument("--target-db", type=float, default=-16.0)
    s.add_argument("--denoise", type=float, default=0.0,
                   help="spectral denoise strength 0-1")
    s.add_argument("--effects", action="store_true",
                   help="highpass/lowpass/EQ chain")
    s.set_defaults(fn=run_preprocess)

    s = sub.add_parser("convert", help="convert an HF snapshot to npz")
    s.add_argument("--input", "-i", required=True)
    s.add_argument("--output", "-o", required=True)
    s.set_defaults(fn=run_convert)

    s = sub.add_parser("models", help="model registry")
    s.add_argument("action", choices=["check", "list", "download"])
    s.set_defaults(fn=run_models)

    s = sub.add_parser("eval", help="WER/DER accuracy gates over a fixture dir")
    s.add_argument("--audio", required=True)
    s.add_argument("--ref", default=None, help="dir of <stem>.txt transcripts")
    s.add_argument("--rttm", default=None, help="dir of <stem>.rttm files")
    s.add_argument("--model", default=None)
    s.add_argument("--num-speakers", type=int, default=0)
    s.add_argument("--collar", type=float, default=0.25)
    s.set_defaults(fn=run_eval)

    s = sub.add_parser("check-tpu", help="device probe + matmul benchmark")
    s.set_defaults(fn=run_check_tpu)

    args = p.parse_args(argv)
    _apply_platform(args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
