"""Honesty gate (VERDICT r4 #7): every artifact STATUS.md cites must
exist on disk. Round 4 claimed a scaling measurement whose output file
(docs/SCALING.json) had never been produced; this check makes that
class of claim fail the pre-commit gate mechanically.

Scans STATUS.md for repo-relative path tokens (docs/*, scripts/*,
tests/*, package files, BENCH_*/MULTICHIP_* jsons) and exits non-zero
listing any cited path that does not exist.
"""

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# path-looking tokens: word chars / dots / dashes joined by slashes,
# ending in a known artifact extension, or top-level UPPERCASE jsons
PATH_RE = re.compile(
    r"\b((?:docs|scripts|tests|examples|native|turbo_whisper_workspace_tpu)"
    r"(?:/[\w.\-]+)+\.(?:py|json|md|sh|cpp|h|wav|flac)"
    r"|(?:BENCH|MULTICHIP)_r\d+\.json"
    r"|[A-Z]+\.json)\b"
)


def main() -> int:
    status = REPO / "STATUS.md"
    if not status.exists():
        print("check_status_claims: STATUS.md absent — nothing to check")
        return 0
    text = status.read_text()
    ref = pathlib.Path("/root/reference")
    missing = sorted(
        {m.group(1) for m in PATH_RE.finditer(text)
         if not (REPO / m.group(1)).exists()
         # left-hand table columns cite REFERENCE components by path;
         # those are naming upstream files, not claiming our artifacts
         and not (ref / m.group(1)).exists()}
    )
    if missing:
        print("check_status_claims: STATUS.md cites artifacts that do "
              "not exist:")
        for p in missing:
            print(f"  MISSING {p}")
        return 1
    print("check_status_claims: all cited artifacts exist")
    return 0


if __name__ == "__main__":
    sys.exit(main())
