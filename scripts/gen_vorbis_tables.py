"""Generate native/vorbis_tables.h — the Vorbis I floor1 dB table.

Vorbis is almost entirely self-describing (Huffman codebooks, floor and
residue configurations all arrive in the stream's own setup header, and
the window function is a closed formula), so unlike MP3/AAC only ONE
piece of fixed public-standard data is needed: the 256-entry
floor1_inverse_dB_table (Vorbis I spec §10.3). As with
scripts/gen_mp3_tables.py / gen_aac_tables.py, it is recovered from the
system codec archive's symbol tables (pure constant-data extraction).

Run once; the generated header is committed.
"""

import os
import re
import struct
import subprocess
import tempfile

AR = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT_H = os.path.join(os.path.dirname(__file__), "..", "native",
                     "vorbis_tables.h")


def main():
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(["ar", "x", AR, "vorbis_data.o"], cwd=tmp, check=True)
        opath = os.path.join(tmp, "vorbis_data.o")
        syms = subprocess.run(["readelf", "-sW", opath], check=True,
                              capture_output=True, text=True).stdout
        m = re.search(
            r"\s*\d+:\s+([0-9a-f]+)\s+(\d+)\s+OBJECT\s+\S+\s+\S+\s+(\d+)\s+"
            r"ff_vorbis_floor1_inverse_db_table", syms)
        assert m, "symbol not found"
        off, size, sec = int(m.group(1), 16), int(m.group(2)), int(m.group(3))
        assert size == 1024, size
        sects = subprocess.run(["readelf", "-SW", opath], check=True,
                               capture_output=True, text=True).stdout
        sec_name = None
        for sm in re.finditer(r"\[\s*(\d+)\]\s+(\S+)\s+PROGBITS", sects):
            if int(sm.group(1)) == sec:
                sec_name = sm.group(2)
        bin_path = os.path.join(tmp, "sec.bin")
        subprocess.run(["objcopy", "-O", "binary",
                        f"--only-section={sec_name}", opath, bin_path],
                       check=True)
        with open(bin_path, "rb") as f:
            data = f.read()[off:off + size]
    vals = struct.unpack("<256f", data)
    assert vals[0] < 1e-6 and 0.5 < vals[255] <= 1.0, (vals[0], vals[255])

    lines = [
        "// Vorbis I floor1_inverse_dB_table (spec §10.3) — public-standard",
        "// data recovered from the system codec archive by",
        "// scripts/gen_vorbis_tables.py. Generated file: do not edit.",
        "#pragma once",
        "",
        "namespace vorbistab {",
        "static const float floor1_inverse_db[256] = {",
    ]
    for i in range(0, 256, 4):
        lines.append("  " + ",".join(f"{v:.9e}f" for v in vals[i:i + 4]) + ",")
    lines += ["};", "}  // namespace vorbistab"]
    with open(os.path.abspath(OUT_H), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT_H}; table[0]={vals[0]:.6e} table[255]={vals[255]:.6f}")


if __name__ == "__main__":
    main()
