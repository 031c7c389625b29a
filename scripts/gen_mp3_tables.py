"""Generate native/mp3_tables.h — the ISO/IEC 11172-3 constant tables.

The MPEG-1/2 Layer III bitstream constants (Annex B: Huffman code
tables B.7, scalefactor band boundaries B.8, pretab, slen pairs, the
synthesis-filterbank window C.1) are fixed public-standard data, the
same in every conforming codec. With no network egress and no spec PDF
in this environment, this script recovers them from the system
libavcodec static archive's symbol tables (readelf/objcopy on
mpegaudio*.o — pure data extraction, no code), reconstructs the
canonical Huffman codewords from the stored (length, symbol) lists,
validates each table is a complete prefix code (Kraft sum == 1), and
emits a self-contained C++ header plus a Python mirror used by the test
bitstream writer.

Run once; the generated files are committed. Regenerate with:
    python scripts/gen_mp3_tables.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

AR = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT_H = os.path.join(os.path.dirname(__file__), "..", "native", "mp3_tables.h")
OUT_PY = os.path.join(os.path.dirname(__file__), "..", "tests", "mp3_tables.py")

# big-value Huffman tables in storage order (ISO table numbers); their
# (xmax, ymax) dimensions fix the entry counts
HUFF_IDS = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]
HUFF_DIMS = {
    1: 2, 2: 3, 3: 3, 5: 4, 6: 4, 7: 6, 8: 6, 9: 6,
    10: 8, 11: 8, 12: 8, 13: 16, 15: 16, 16: 16, 24: 16,
}


def extract(tmp: str, obj: str, want: dict[str, tuple[int, int]]) -> dict[str, bytes]:
    """want: symbol -> (expected_size, _). Returns symbol -> bytes."""
    subprocess.run(["ar", "x", AR, obj], cwd=tmp, check=True)
    opath = os.path.join(tmp, obj)
    syms = subprocess.run(["readelf", "-sW", opath], check=True,
                          capture_output=True, text=True).stdout
    sects = subprocess.run(["readelf", "-SW", opath], check=True,
                           capture_output=True, text=True).stdout
    # section index -> name
    sec_names = {}
    for m in re.finditer(r"\[\s*(\d+)\]\s+(\S+)\s+PROGBITS", sects):
        sec_names[int(m.group(1))] = m.group(2)
    out = {}
    for line in syms.splitlines():
        m = re.match(
            r"\s*\d+:\s+([0-9a-f]+)\s+(\d+)\s+OBJECT\s+\S+\s+\S+\s+(\d+)\s+(\S+)",
            line)
        if not m:
            continue
        off, size, sec, name = (int(m.group(1), 16), int(m.group(2)),
                                int(m.group(3)), m.group(4))
        if name in want:
            exp_size, _ = want[name]
            assert size == exp_size, (name, size, exp_size)
            sec_name = sec_names.get(sec)
            bin_path = os.path.join(tmp, f"{obj}.{sec}.bin")
            subprocess.run(
                ["objcopy", "-O", "binary", f"--only-section={sec_name}",
                 opath, bin_path], check=True)
            with open(bin_path, "rb") as f:
                data = f.read()
            out[name] = data[off:off + size]
    missing = set(want) - set(out)
    assert not missing, f"symbols not found: {missing}"
    return out


def canonical_codes(lens: bytes, syms: bytes) -> list[tuple[int, int, int, int]]:
    """(len, symbol) list in canonical order -> [(code, len, x, y)].

    Codewords are assigned left-aligned in listing order: each entry
    takes the current 32-bit prefix, then advances it by 2^(32-len) —
    the construction libavcodec's vlc_init_from_lengths applies to
    these tables, which reproduces the ISO Annex B.7 codebooks.
    """
    acc = 0
    out = []
    for ln, sym in zip(lens, syms):
        assert 0 < ln <= 24, ln
        code = acc >> (32 - ln)
        out.append((code, ln, sym >> 4, sym & 15))
        acc += 1 << (32 - ln)
    assert acc == 1 << 32, f"incomplete code: Kraft sum {acc / 2.0**32}"
    # prefix-freeness: complete canonical construction guarantees it,
    # but double-check pairwise on small tables
    return out


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        common = extract(tmp, "mpegaudiodec_common.o", {
            "mpa_huff_sizes_minus_one": (15, 0),
            "mpa_hufflens": (1378, 0),
            "mpa_huffsymbols": (1378, 0),
            "mpa_quad_bits": (32, 0),
            "mpa_quad_codes": (32, 0),
            "ff_mpa_huff_data": (64, 0),
            "ff_band_size_long": (198, 0),
            "ff_band_size_short": (117, 0),
            "ff_mpa_pretab": (44, 0),
            "ff_slen_table": (32, 0),
            "ff_lsf_nsf_table": (72, 0),
        })
        dsp = extract(tmp, "mpegaudiodsp_data.o",
                      {"ff_mpa_enwindow": (1028, 0)})

    sizes = [b + 1 for b in common["mpa_huff_sizes_minus_one"]]
    assert sizes == [HUFF_DIMS[t] ** 2 for t in HUFF_IDS], sizes
    tables = {}
    off = 0
    for t, n in zip(HUFF_IDS, sizes):
        tables[t] = canonical_codes(
            common["mpa_hufflens"][off:off + n],
            common["mpa_huffsymbols"][off:off + n])
        off += n
    assert off == 1378

    # count1 (quad) tables: [2][16] codes + bits; table B is 4-bit fixed
    quad_codes = list(common["mpa_quad_codes"])
    quad_bits = list(common["mpa_quad_bits"])
    assert all(b == 4 for b in quad_bits[16:]), "count1 table B must be 4-bit"

    # table_select -> (vlc table index 0..15 in [0]+HUFF_IDS order, linbits)
    huff_data = [(common["ff_mpa_huff_data"][2 * i],
                  common["ff_mpa_huff_data"][2 * i + 1]) for i in range(32)]

    band_long = [list(common["ff_band_size_long"][i * 22:(i + 1) * 22])
                 for i in range(9)]
    band_short = [list(common["ff_band_size_short"][i * 13:(i + 1) * 13])
                  for i in range(9)]
    pretab = [list(common["ff_mpa_pretab"][:22]),
              list(common["ff_mpa_pretab"][22:])]
    slen = [list(common["ff_slen_table"][:16]),
            list(common["ff_slen_table"][16:])]
    lsf_nsf = [[list(common["ff_lsf_nsf_table"][(i * 3 + j) * 4:
                                                (i * 3 + j) * 4 + 4])
                for j in range(3)] for i in range(6)]

    import struct
    enwindow = list(struct.unpack("<257i", dsp["ff_mpa_enwindow"]))

    # ---- emit C++ header ----
    lines = [
        "// MPEG-1/2 Layer III constant tables (ISO/IEC 11172-3 Annex B,",
        "// synthesis window Annex C) — public-standard data recovered from",
        "// the system codec archive by scripts/gen_mp3_tables.py.",
        "// Generated file: do not edit by hand.",
        "#pragma once",
        "#include <cstdint>",
        "",
        "namespace mp3tab {",
        "",
        "struct HuffEntry { uint32_t code; uint8_t len; uint8_t x; uint8_t y; };",
        "",
    ]
    for t in HUFF_IDS:
        ents = tables[t]
        lines.append(f"static const HuffEntry huff_{t}[{len(ents)}] = {{")
        for i in range(0, len(ents), 4):
            row = ", ".join(f"{{{c}u,{l},{x},{y}}}" for c, l, x, y in ents[i:i + 4])
            lines.append(f"  {row},")
        lines.append("};")
    lines.append("")
    lines.append("struct HuffTable { const HuffEntry* e; int n; int xy; };")
    idx_order = [0] + HUFF_IDS
    lines.append(f"static const HuffTable huff_tables[16] = {{")
    lines.append("  {nullptr, 0, 0},")
    for t in HUFF_IDS:
        lines.append(f"  {{huff_{t}, {len(tables[t])}, {HUFF_DIMS[t]}}},")
    lines.append("};")
    lines.append("")
    lines.append("// table_select (0-31) -> {huff_tables index, linbits}")
    lines.append("static const uint8_t huff_select[32][2] = {")
    lines.append("  " + ", ".join(f"{{{a},{b}}}" for a, b in huff_data))
    lines.append("};")
    lines.append("")
    lines.append("// count1 quadruple tables: [2][16] codes / bit lengths")
    lines.append("static const uint8_t quad_codes[2][16] = {")
    lines.append("  {" + ",".join(map(str, quad_codes[:16])) + "},")
    lines.append("  {" + ",".join(map(str, quad_codes[16:])) + "},")
    lines.append("};")
    lines.append("static const uint8_t quad_bits[2][16] = {")
    lines.append("  {" + ",".join(map(str, quad_bits[:16])) + "},")
    lines.append("  {" + ",".join(map(str, quad_bits[16:])) + "},")
    lines.append("};")
    lines.append("")
    lines.append("// scalefactor band sizes; rows: 3 MPEG-1 rates (44.1/48/32k),")
    lines.append("// 3 MPEG-2 (22.05/24/16k), 3 MPEG-2.5 (11.025/12/8k)")
    lines.append("static const uint8_t band_size_long[9][22] = {")
    for row in band_long:
        lines.append("  {" + ",".join(map(str, row)) + "},")
    lines.append("};")
    lines.append("static const uint8_t band_size_short[9][13] = {")
    for row in band_short:
        lines.append("  {" + ",".join(map(str, row)) + "},")
    lines.append("};")
    lines.append("static const uint8_t pretab[2][22] = {")
    for row in pretab:
        lines.append("  {" + ",".join(map(str, row)) + "},")
    lines.append("};")
    lines.append("// MPEG-1 scalefac_compress -> (slen1, slen2)")
    lines.append("static const uint8_t slen_table[2][16] = {")
    for row in slen:
        lines.append("  {" + ",".join(map(str, row)) + "},")
    lines.append("};")
    lines.append("// MPEG-2 LSF scalefactor group sizes [6][3][4]")
    lines.append("static const uint8_t lsf_nsf_table[6][3][4] = {")
    for blk in lsf_nsf:
        lines.append("  {" + ", ".join("{" + ",".join(map(str, r)) + "}"
                                       for r in blk) + "},")
    lines.append("};")
    lines.append("")
    lines.append("// synthesis-filterbank half window (Annex C), int32 Q16.15-ish;")
    lines.append("// full 512-tap window expands antisymmetrically in the decoder")
    lines.append(f"static const int32_t enwindow[257] = {{")
    for i in range(0, 257, 8):
        lines.append("  " + ",".join(map(str, enwindow[i:i + 8])) + ",")
    lines.append("};")
    lines.append("")
    lines.append("}  // namespace mp3tab")
    with open(os.path.abspath(OUT_H), "w") as f:
        f.write("\n".join(lines) + "\n")

    # ---- emit Python mirror (for the test-suite bitstream writer) ----
    py = [
        '"""MPEG-1 Layer III spec tables (generated by scripts/gen_mp3_tables.py).',
        "",
        "Python mirror of native/mp3_tables.h for the test encoder; see that",
        'header for provenance."""',
        "",
        f"HUFF_TABLES = {{",
    ]
    for t in HUFF_IDS:
        py.append(f"  {t}: {tables[t]!r},")
    py.append("}")
    py.append(f"HUFF_SELECT = {huff_data!r}")
    py.append(f"QUAD_CODES = {[quad_codes[:16], quad_codes[16:]]!r}")
    py.append(f"QUAD_BITS = {[quad_bits[:16], quad_bits[16:]]!r}")
    py.append(f"BAND_SIZE_LONG = {band_long!r}")
    py.append(f"BAND_SIZE_SHORT = {band_short!r}")
    py.append(f"PRETAB = {pretab!r}")
    py.append(f"SLEN_TABLE = {slen!r}")
    py.append(f"LSF_NSF_TABLE = {lsf_nsf!r}")
    py.append(f"ENWINDOW = {enwindow!r}")
    with open(os.path.abspath(OUT_PY), "w") as f:
        f.write("\n".join(py) + "\n")

    print(f"wrote {OUT_H} and {OUT_PY}")
    print(f"tables: {len(HUFF_IDS)} big-value Huffman codebooks, all complete "
          f"prefix codes; quad A lens {sorted(set(quad_bits[:16]))}, "
          f"B fixed 4-bit")


if __name__ == "__main__":
    main()
