"""Extract the stempel Polish stemming table as pure data.

The reference ships the Egothor-project stemming table
(lucene/analysis/stempel/src/resources/org/apache/lucene/analysis/pl/
stemmer_20000.tbl) as a java.io.DataOutput-serialized MultiTrie2 (format:
Trie.store, Trie.java:315-325; Row.store, Row.java; MultiTrie.store).  This
reads that PUBLIC DATA file (Egothor/ALv2-distributed linguistic data, the
same extraction precedent as tools/extract_kstem_lexicon.py) into a gzipped
JSON the Python stemmer loads.  No reference CODE is copied — only the
binary table is decoded.

Layout produced:
  {"method": str, "forward": bool, "BY": int,
   "tries": [{"forward": bool, "root": int, "cmds": [str...],
              "rows": [[[ch, cmd, ref], ...] per row]}]}
(cell 'cnt'/'skip' fields are build-time metadata, unused by lookup.)

Run: python tools/extract_stempel_table.py
Output: lucene_solr_spark/analysis/data/stempel_pl.json.gz
"""

from __future__ import annotations

import gzip
import json
import os
import struct

SRC = (
    "/root/reference/lucene/analysis/stempel/src/resources/"
    "org/apache/lucene/analysis/pl/stemmer_20000.tbl"
)
OUT = os.path.join(
    os.path.dirname(__file__), "..",
    "lucene_solr_spark", "analysis", "data", "stempel_pl.json.gz",
)


class _DataInput:
    """java.io.DataInputStream reader: big-endian, modified-UTF-8 strings."""

    def __init__(self, data: bytes):
        self.b = data
        self.p = 0

    def read_boolean(self) -> bool:
        v = self.b[self.p]
        self.p += 1
        return v != 0

    def read_int(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.p)
        self.p += 4
        return v

    def read_char(self) -> str:
        (v,) = struct.unpack_from(">H", self.b, self.p)
        self.p += 2
        return chr(v)

    def read_utf(self) -> str:
        (n,) = struct.unpack_from(">H", self.b, self.p)
        self.p += 2
        raw = self.b[self.p : self.p + n]
        self.p += n
        # modified UTF-8: no 4-byte forms; U+0000 as C0 80; surrogates as
        # separate 3-byte units — decode manually
        out = []
        i = 0
        while i < n:
            c = raw[i]
            if c < 0x80:
                out.append(chr(c))
                i += 1
            elif (c & 0xE0) == 0xC0:
                out.append(chr(((c & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
                i += 2
            else:
                out.append(
                    chr(
                        ((c & 0x0F) << 12)
                        | ((raw[i + 1] & 0x3F) << 6)
                        | (raw[i + 2] & 0x3F)
                    )
                )
                i += 3
        return "".join(out)


def _read_trie(d: _DataInput) -> dict:
    forward = d.read_boolean()
    root = d.read_int()
    cmds = [d.read_utf() for _ in range(d.read_int())]
    rows = []
    for _ in range(d.read_int()):
        cells = []
        for _ in range(d.read_int()):
            ch = d.read_char()
            cmd = d.read_int()
            _cnt = d.read_int()
            ref = d.read_int()
            _skip = d.read_int()
            cells.append([ch, cmd, ref])
        rows.append(cells)
    return {"forward": forward, "root": root, "cmds": cmds, "rows": rows}


def main() -> None:
    with open(SRC, "rb") as f:
        d = _DataInput(f.read())
    method = d.read_utf()
    if "M" not in method.upper():
        table = {"method": method, "tries": [_read_trie(d)]}
    else:
        forward = d.read_boolean()
        by = d.read_int()
        tries = [_read_trie(d) for _ in range(d.read_int())]
        table = {"method": method, "forward": forward, "BY": by, "tries": tries}
    assert d.p == len(d.b), f"trailing bytes: {len(d.b) - d.p}"
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(table, f, ensure_ascii=False, separators=(",", ":"))
    n_cells = sum(len(c) for t in table["tries"] for c in t["rows"])
    print(
        f"method={method!r} tries={len(table['tries'])} cells={n_cells} "
        f"-> {OUT} ({os.path.getsize(OUT)} bytes)"
    )


if __name__ == "__main__":
    main()
