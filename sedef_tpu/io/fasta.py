"""FASTA access via samtools-style .fai index.

Equivalent of the reference ``FastaReference`` (``src/fasta.{h,cc}``):
mmap'd random access with newline arithmetic, plus the super-bin
``translation_index`` used to map packed multi-contig coordinates back to
real chromosomes (``fasta.h:53-54``, ``hit.cc:144-171``).
"""

from __future__ import annotations

import mmap
import os
import pathlib


class FaiEntry:
    __slots__ = ("name", "length", "offset", "line_blen", "line_len")

    def __init__(self, name, length, offset, line_blen, line_len):
        self.name = name
        self.length = int(length)
        self.offset = int(offset)
        self.line_blen = int(line_blen)
        self.line_len = int(line_len)


def write_fai(fasta_path: str) -> str:
    """Create a .fai index (samtools faidx equivalent) if absent."""
    fai_path = fasta_path + ".fai"
    if os.path.exists(fai_path):
        return fai_path
    entries = []
    with open(fasta_path, "rb") as f:
        name = None
        length = 0
        offset = 0
        line_blen = line_len = 0
        pos = 0
        for line in f:
            if line.startswith(b">"):
                if name is not None:
                    entries.append((name, length, offset, line_blen, line_len))
                name = line[1:].split()[0].decode()
                pos += len(line)
                offset = pos
                length = 0
                line_blen = line_len = 0
            else:
                blen = len(line.rstrip(b"\r\n"))
                if line_blen == 0:
                    line_blen = blen
                    line_len = len(line)
                length += blen
                pos += len(line)
        if name is not None:
            entries.append((name, length, offset, line_blen, line_len))
    with open(fai_path, "w") as f:
        for e in entries:
            f.write("\t".join(map(str, e)) + "\n")
    return fai_path


class FastaReference:
    def __init__(self, path: str):
        self.path = path
        fai = path + ".fai"
        if not os.path.exists(fai):
            write_fai(path)
        self.index: dict[str, FaiEntry] = {}
        self.order: list[str] = []
        for line in pathlib.Path(fai).read_text().splitlines():
            parts = line.split("\t")
            e = FaiEntry(parts[0], *parts[1:5])
            self.index[e.name] = e
            self.order.append(e.name)
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        # name -> sorted [(packed_start, real_chr_name)] (hit.cc:122-171)
        self.translation_index: dict[str, list[tuple[int, str]]] = {}

    def close(self):
        self._mm.close()
        self._f.close()

    def length(self, name: str) -> int:
        return self.index[name].length

    def get_sequence(self, name: str, start: int = 0,
                     end: int | None = None) -> str:
        """Substring [start, end) of a sequence; end=None -> whole tail.

        Mirrors fasta.cc:105-142 (end clamped to the sequence length).
        """
        e = self.index.get(name)
        if e is None:
            raise KeyError(f"sequence {name} not found in index")
        start = max(0, start)  # fasta.cc:108-110
        if end is None:
            end = e.length
        end = min(end, e.length)  # fasta.cc:112-116 (callers re-clamp via
        if start >= end:          # ``length()``)
            return ""
        # byte offsets with newline arithmetic
        bs = e.offset + start // e.line_blen * e.line_len + start % e.line_blen
        be = e.offset + (end - 1) // e.line_blen * e.line_len \
            + (end - 1) % e.line_blen + 1
        raw = self._mm[bs:be]
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode("ascii")


def generate_translation(fr: FastaReference, max_size: int = 100_000_000
                         ) -> list[list[str]]:
    """Pack chromosomes (sorted by length desc) into <= max_size super-bins
    (``search_main.cc:93-120``)."""
    vv = sorted(((e.length, name) for name, e in fr.index.items()),
                reverse=True)
    bins: list[list[str]] = []
    cur = 0
    for length, name in vv:
        if not bins or cur + length > max_size:
            bins.append([name])
            cur = length
        else:
            bins[-1].append(name)
            cur += length
    return bins


def populate_translation_index(fr: FastaReference) -> None:
    """Build packed-coordinate -> chromosome lookup for every super-bin.

    The reference populates ``translation_index`` implicitly when reading
    binned sequences; the packed bin concatenates its chromosomes in bin
    order, so each gets (cumulative offset, name)."""
    bins = generate_translation(fr)
    fr.translation_index = {}
    for bi, names in enumerate(bins):
        acc = []
        off = 0
        for name in names:
            acc.append((off, name))
            off += fr.index[name].length
        fr.translation_index[str(bi)] = acc


def bin_sequence(fr: FastaReference, names: list[str]) -> str:
    """Concatenated sequence of one super-bin."""
    return "".join(fr.get_sequence(n) for n in names)
