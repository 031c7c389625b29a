"""Generate native/aac_tables.h — the ISO/IEC 14496-3 AAC constant tables.

The AAC-LC bitstream constants (spectral Huffman codebooks 1-11 and the
scalefactor codebook, Tables 4.A.2-4.A.13; scalefactor-band offsets per
sampling rate, Tables 4.129-4.147; TNS max-band limits, Table 4.139)
are fixed public-standard data, identical in every conforming codec.
With no network egress and no spec PDF in this environment, this script
recovers them from the system libavcodec static archive's symbol tables
(readelf/objcopy on aactab.o — pure constant-data extraction, the same
provenance as native/mp3_tables.h via scripts/gen_mp3_tables.py),
validates every codebook is a prefix code, and emits a self-contained
C++ header plus a Python mirror for the test bitstream tooling.

Spectral tuple values are NOT extracted: they are reconstructed from
the codeword index by the spec's unsigned/signed base-3/9/8/13/17 digit
decomposition (14496-3 §4.6.3.3), which is pure arithmetic.

Run once; the generated files are committed. Regenerate with:
    python scripts/gen_aac_tables.py
"""

from __future__ import annotations

import os
import re
import struct
import subprocess
import tempfile

AR = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT_H = os.path.join(os.path.dirname(__file__), "..", "native", "aac_tables.h")
OUT_PY = os.path.join(os.path.dirname(__file__), "..", "tests", "aac_tables.py")

# spectral codebook entry counts: cb 1-4 are 4-tuples over {-1..1}/{0..2}
# (3^4=81), cb 5/6 pairs over {-4..4} (81), 7/8 pairs {0..7} (64),
# 9/10 pairs {0..12} (169), 11 pairs {0..16} (289, 16=escape)
CB_SIZES = [81, 81, 81, 81, 81, 81, 64, 64, 169, 169, 289]


def run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, text=True,
                          **kw).stdout


def extract_obj(tmp: str, obj: str):
    """Return (symbol -> bytes, symbol -> [(offset, target_sym)]) maps."""
    subprocess.run(["ar", "x", AR, obj], cwd=tmp, check=True)
    opath = os.path.join(tmp, obj)
    syms_txt = run(["readelf", "-sW", opath])
    sects_txt = run(["readelf", "-SW", opath])
    sec_names = {}
    for m in re.finditer(r"\[\s*(\d+)\]\s+(\S+)\s+PROGBITS", sects_txt):
        sec_names[int(m.group(1))] = m.group(2)

    sym_info = {}  # name -> (section_idx, offset, size)
    for line in syms_txt.splitlines():
        m = re.match(
            r"\s*\d+:\s+([0-9a-f]+)\s+(\d+)\s+OBJECT\s+\S+\s+\S+\s+(\d+)\s+(\S+)",
            line)
        if m:
            sym_info[m.group(4)] = (int(m.group(3)), int(m.group(1), 16),
                                    int(m.group(2)))

    sec_bytes = {}

    def sec_data(idx):
        if idx not in sec_bytes:
            bin_path = os.path.join(tmp, f"{obj}.{idx}.bin")
            subprocess.run(
                ["objcopy", "-O", "binary",
                 f"--only-section={sec_names[idx]}", opath, bin_path],
                check=True)
            with open(bin_path, "rb") as f:
                sec_bytes[idx] = f.read()
        return sec_bytes[idx]

    def get(name):
        sec, off, size = sym_info[name]
        return sec_data(sec)[off:off + size]

    # relocations: for pointer arrays (ff_swb_offset_*), map each slot to
    # the local table symbol it points at
    rel_txt = run(["readelf", "-rW", opath])
    relocs = {}  # (section_suffix_name) handled generically below
    # readelf -rW prints "Relocation section '.rela.data.rel.ro' ..." blocks
    # with lines: offset info type sym_value sym_name + addend
    cur = None
    for line in rel_txt.splitlines():
        m = re.match(r"Relocation section '\.rela(\S+)'", line)
        if m:
            cur = m.group(1)
            relocs[cur] = []
            continue
        m = re.match(
            r"([0-9a-f]+)\s+[0-9a-f]+\s+\S+\s+[0-9a-f]+\s+(\S+)\s*([+-]\s*[0-9a-f]+)?",
            line)
        if m and cur:
            addend = 0
            if m.group(3):
                addend = int(m.group(3).replace(" ", ""), 16)
            relocs[cur].append((int(m.group(1), 16), m.group(2), addend))

    def pointer_targets(name):
        sec, off, size = sym_info[name]
        sec_name = sec_names[sec]
        out = [None] * (size // 8)
        for rel_sec, entries in relocs.items():
            if not sec_name.endswith(rel_sec) and rel_sec != sec_name:
                continue
            for r_off, r_sym, r_add in entries:
                if off <= r_off < off + size:
                    # target may be a section symbol + addend; resolve to
                    # the local symbol at that (section, offset)
                    tgt = r_sym
                    if r_sym.startswith(".") and r_add is not None:
                        for nm, (s2, o2, sz2) in sym_info.items():
                            if sec_names.get(s2) == r_sym and o2 == r_add:
                                tgt = nm
                                break
                    out[(r_off - off) // 8] = tgt
        return out

    return get, pointer_targets, sym_info


def u16s(b):
    return list(struct.unpack(f"<{len(b) // 2}H", b))


def u32s(b):
    return list(struct.unpack(f"<{len(b) // 4}I", b))


def check_prefix_code(codes, bits, name):
    """Prefix-freeness: no codeword is a prefix of another."""
    seen = sorted(zip(bits, codes))
    for i, (li, ci) in enumerate(seen):
        for lj, cj in seen[i + 1:]:
            assert not (cj >> (lj - li)) == ci, \
                f"{name}: {ci:0{li}b} prefixes {cj:0{lj}b}"
    kraft = sum(2.0 ** -l for l in bits)
    assert kraft <= 1.0 + 1e-9, (name, kraft)
    return kraft


def main():
    with tempfile.TemporaryDirectory() as tmp:
        get, ptr_targets, sym_info = extract_obj(tmp, "aactab.o")

        cb_codes, cb_bits = [], []
        for i in range(1, 12):
            codes = u16s(get(f"codes{i}"))
            bits = list(get(f"bits{i}"))
            assert len(codes) == CB_SIZES[i - 1] == len(bits), (i, len(codes))
            k = check_prefix_code(codes, bits, f"codes{i}")
            print(f"cb{i}: {len(codes)} entries, max {max(bits)} bits, "
                  f"kraft {k:.6f}")
            cb_codes.append(codes)
            cb_bits.append(bits)

        sf_code = u32s(get("ff_aac_scalefactor_code"))
        sf_bits = list(get("ff_aac_scalefactor_bits"))
        assert len(sf_code) == 121 == len(sf_bits)
        check_prefix_code(sf_code, sf_bits, "scalefactor")

        num_swb_1024 = list(get("ff_aac_num_swb_1024"))
        num_swb_128 = list(get("ff_aac_num_swb_128"))
        tns_max_1024 = list(get("ff_tns_max_bands_1024"))
        tns_max_128 = list(get("ff_tns_max_bands_128"))

        # per-rate swb offset tables via the pointer arrays' relocations
        def swb_tables(ptr_name):
            targets = ptr_targets(ptr_name)
            assert all(t for t in targets), (ptr_name, targets)
            uniq = []
            for t in targets:
                if t not in uniq:
                    uniq.append(t)
            tabs = {t: u16s(get(t)) for t in uniq}
            return targets, tabs

        long_targets, long_tabs = swb_tables("ff_swb_offset_1024")
        short_targets, short_tabs = swb_tables("ff_swb_offset_128")

    for idx, (lt, st, nl, ns) in enumerate(
            zip(long_targets, short_targets, num_swb_1024, num_swb_128)):
        # table must cover num_swb+1 offsets ending at the frame length
        assert len(long_tabs[lt]) >= nl + 1, (idx, lt, nl)
        assert long_tabs[lt][nl] == 1024, (idx, lt, long_tabs[lt][nl])
        assert short_tabs[st][ns] == 128, (idx, st)

    # ---- emit C++ header ----
    lines = [
        "// AAC-LC constant tables (ISO/IEC 14496-3 §4.A, §4.5.4) —",
        "// public-standard data recovered from the system codec archive",
        "// by scripts/gen_aac_tables.py. Generated file: do not edit.",
        "#pragma once",
        "#include <cstdint>",
        "",
        "namespace aactab {",
        "",
        "// spectral Huffman codebooks 1..11: parallel code/length arrays,",
        "// index = tuple index (spec digit decomposition recovers values)",
    ]
    for i in range(11):
        codes, bits = cb_codes[i], cb_bits[i]
        lines.append(f"static const uint16_t cb{i + 1}_codes[{len(codes)}] = {{")
        for j in range(0, len(codes), 12):
            lines.append("  " + ",".join(map(str, codes[j:j + 12])) + ",")
        lines.append("};")
        lines.append(f"static const uint8_t cb{i + 1}_bits[{len(bits)}] = {{")
        for j in range(0, len(bits), 20):
            lines.append("  " + ",".join(map(str, bits[j:j + 20])) + ",")
        lines.append("};")
    lines += [
        "",
        "struct SpecCB { const uint16_t* codes; const uint8_t* bits; int n; };",
        "static const SpecCB spec_cb[11] = {",
    ]
    for i in range(11):
        lines.append(f"  {{cb{i + 1}_codes, cb{i + 1}_bits, {CB_SIZES[i]}}},")
    lines += [
        "};",
        "",
        "// scalefactor codebook: index 0..120 -> dpcm value index-60",
        f"static const uint32_t sf_codes[121] = {{",
    ]
    for j in range(0, 121, 8):
        lines.append("  " + ",".join(map(str, sf_code[j:j + 8])) + ",")
    lines += [
        "};",
        f"static const uint8_t sf_bits[121] = {{",
    ]
    for j in range(0, 121, 20):
        lines.append("  " + ",".join(map(str, sf_bits[j:j + 20])) + ",")
    lines += [
        "};",
        "",
        "// sampling_frequency_index 0..12 ->",
        "// 96000,88200,64000,48000,44100,32000,24000,22050,16000,12000,11025,8000,7350",
        "static const int sample_rates[13] = {96000,88200,64000,48000,44100,"
        "32000,24000,22050,16000,12000,11025,8000,7350};",
        "static const uint8_t num_swb_1024[13] = {"
        + ",".join(map(str, num_swb_1024)) + "};",
        "static const uint8_t num_swb_128[13] = {"
        + ",".join(map(str, num_swb_128)) + "};",
        "static const uint8_t tns_max_bands_1024[13] = {"
        + ",".join(map(str, tns_max_1024)) + "};",
        "static const uint8_t tns_max_bands_128[13] = {"
        + ",".join(map(str, tns_max_128)) + "};",
        "",
    ]
    emitted = {}
    for t, tab in {**long_tabs, **short_tabs}.items():
        emitted[t] = t
        lines.append(f"static const uint16_t {t}[{len(tab)}] = {{"
                     + ",".join(map(str, tab)) + "};")
    lines += [
        "",
        "static const uint16_t* swb_offset_1024[13] = {",
        "  " + ",".join(long_targets) + ",",
        "};",
        "static const uint16_t* swb_offset_128[13] = {",
        "  " + ",".join(short_targets) + ",",
        "};",
        "",
        "}  // namespace aactab",
    ]
    with open(os.path.abspath(OUT_H), "w") as f:
        f.write("\n".join(lines) + "\n")

    # ---- Python mirror for test tooling ----
    py = [
        '"""AAC-LC spec tables (generated by scripts/gen_aac_tables.py).',
        "",
        "Python mirror of native/aac_tables.h for test tooling; see that",
        'header for provenance."""',
        "",
        f"CB_CODES = {cb_codes!r}",
        f"CB_BITS = {cb_bits!r}",
        f"SF_CODES = {sf_code!r}",
        f"SF_BITS = {sf_bits!r}",
        f"SAMPLE_RATES = [96000,88200,64000,48000,44100,32000,24000,22050,"
        f"16000,12000,11025,8000,7350]",
        f"NUM_SWB_1024 = {num_swb_1024!r}",
        f"NUM_SWB_128 = {num_swb_128!r}",
        f"TNS_MAX_BANDS_1024 = {tns_max_1024!r}",
        f"TNS_MAX_BANDS_128 = {tns_max_128!r}",
        f"SWB_OFFSET_1024 = {[long_tabs[t] for t in long_targets]!r}",
        f"SWB_OFFSET_128 = {[short_tabs[t] for t in short_targets]!r}",
    ]
    with open(os.path.abspath(OUT_PY), "w") as f:
        f.write("\n".join(py) + "\n")
    print(f"wrote {OUT_H} and {OUT_PY}")


if __name__ == "__main__":
    main()
