"""Chromosome-scale synthetic genome generator with planted SDs.

Produces soft-masked sequences with segmental duplications of controlled
length and divergence (SNPs + small indels + occasional large indels,
following the reference simulation's mutation model, simulations.py:53-137)
for accuracy and performance testing without real genome data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


_LOW = np.frombuffer(b"acgt", dtype=np.uint8)
_UP = np.frombuffer(b"ACGT", dtype=np.uint8)


@dataclass
class PlantedSD:
    chrom_a: str
    a_start: int
    a_end: int
    chrom_b: str
    b_start: int
    b_end: int
    is_rc: bool
    divergence: float


def _rand_codes(rng, n):
    return rng.integers(0, 4, n, dtype=np.int8)


def _mutate_codes(rng, codes: np.ndarray, rate: float) -> np.ndarray:
    """SNPs (2/3 of errors) + 1 bp indels (1/3)."""
    n = len(codes)
    snp = rng.random(n) < rate * 2 / 3
    out = codes.copy()
    out[snp] = (out[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
    indel = np.nonzero(rng.random(n) < rate / 3)[0]
    if len(indel):
        keep = np.ones(n, dtype=bool)
        dels = indel[rng.random(len(indel)) < 0.5]
        keep[dels] = False
        pieces = [out[keep]]
        ins = indel[rng.random(len(indel)) < 0.5]
        # simple approximation: append random bases for insertions
        if len(ins):
            extra = _rand_codes(rng, len(ins))
            pieces.append(extra)
        out = np.concatenate(pieces)
    return out


def _to_str(codes: np.ndarray, upper: bool) -> np.ndarray:
    lut = _UP if upper else _LOW
    return lut[codes]


def simulate_genome(length: int = 5_000_000, n_sds: int = 20,
                    sd_min: int = 1500, sd_max: int = 40_000,
                    max_divergence: float = 0.12, rc_fraction: float = 0.3,
                    n_chroms: int = 1, seed: int = 0,
                    n_run_every: int = 0,
                    repeat_families: int = 0, repeat_copies: int = 0,
                    repeat_len: tuple[int, int] = (400, 2500),
                    repeat_div: tuple[float, float] = (0.08, 0.40)
                    ) -> tuple[dict[str, str], list[PlantedSD]]:
    """Returns ({chrom_name: sequence}, planted SD list).

    Background is lowercase (soft-masked) random sequence; SD copies are
    uppercase.  Copies are placed at random non-overlapping positions,
    possibly across chromosomes.

    ``repeat_families``/``repeat_copies`` plant additional UPPERCASE
    repeat families (each family = one ancestral element copied
    ``repeat_copies`` times at divergences spanning ``repeat_div``).
    These are the hg19-like distractors that make stage-1 roll-bound:
    every copy pair forms a candidate interval whose sliding-Jaccard scan
    must run, and the high-divergence pairs fail the gate after the scan.
    They are not recorded in the planted list.
    """
    rng = np.random.default_rng(seed)
    per_chrom = length // n_chroms
    chroms = {}
    buf = {}
    for ci in range(n_chroms):
        name = f"chrS{ci + 1}"
        bg = _to_str(_rand_codes(rng, per_chrom), upper=False)
        buf[name] = bg.copy()
    names = list(buf)

    planted: list[PlantedSD] = []
    # disjoint placed intervals per chromosome, kept sorted by start so
    # the overlap test is two neighbor probes (bisect) instead of a
    # full scan — the O(placements x occupied) scan made a 3 Gbp
    # hg19-density genome (~835K placements, ~35K intervals/chrom) take
    # hours; accept/reject decisions are identical, so genomes are
    # byte-identical for a given seed
    import bisect
    occ_starts: dict[str, list[int]] = {n: [] for n in names}
    occ_ends: dict[str, list[int]] = {n: [] for n in names}

    def place(name, ln):
        st, en = occ_starts[name], occ_ends[name]
        for _ in range(200):
            s = int(rng.integers(0, per_chrom - ln - 1))
            i = bisect.bisect_right(st, s)
            if (i == 0 or en[i - 1] <= s) and \
                    (i == len(st) or s + ln <= st[i]):
                st.insert(i, s)
                en.insert(i, s + ln)
                return s
        return None

    from ..ops.dna import revcomp
    for si in range(n_sds):
        ln = int(rng.integers(sd_min, sd_max))
        div = float(rng.uniform(0.0, max_divergence))
        is_rc = bool(rng.random() < rc_fraction)
        ca = names[int(rng.integers(0, len(names)))]
        cb = names[int(rng.integers(0, len(names)))]
        codes = _rand_codes(rng, ln)
        copy_codes = _mutate_codes(rng, codes, div)
        sa = place(ca, ln)
        sb = place(cb, len(copy_codes))
        if sa is None or sb is None:
            continue
        a_str = _to_str(codes, upper=True)
        b_str = _to_str(copy_codes, upper=True)
        buf[ca][sa:sa + ln] = a_str
        if is_rc:
            b_rc = np.frombuffer(
                revcomp(b_str.tobytes().decode()).encode(), dtype=np.uint8)
            buf[cb][sb:sb + len(b_rc)] = b_rc
        else:
            buf[cb][sb:sb + len(b_str)] = b_str
        planted.append(PlantedSD(ca, sa, sa + ln, cb, sb,
                                 sb + len(copy_codes), is_rc, div))

    for _fam in range(repeat_families):
        ln = int(rng.integers(repeat_len[0], repeat_len[1]))
        ancestor = _rand_codes(rng, ln)
        for _ci in range(repeat_copies):
            div = float(rng.uniform(repeat_div[0], repeat_div[1]))
            copy = _mutate_codes(rng, ancestor, div)
            cc = names[int(rng.integers(0, len(names)))]
            sc = place(cc, len(copy))
            if sc is None:
                continue
            cstr = _to_str(copy, upper=True)
            if rng.random() < rc_fraction:
                from ..ops.dna import revcomp as _rc
                cstr = np.frombuffer(
                    _rc(cstr.tobytes().decode()).encode(), dtype=np.uint8)
            buf[cc][sc:sc + len(cstr)] = cstr

    if n_run_every:
        for name in names:
            st, en = occ_starts[name], occ_ends[name]
            for pos in range(n_run_every, per_chrom - 200, n_run_every):
                i = bisect.bisect_right(st, pos)
                if (i == 0 or en[i - 1] <= pos) and \
                        (i == len(st) or pos + 150 <= st[i]):
                    buf[name][pos:pos + 150] = ord("N")

    for name in names:
        chroms[name] = buf[name].tobytes().decode()
    return chroms, planted


def recall_of(final_rows: list[str], planted: list[PlantedSD],
              frac: float = 0.8) -> int:
    """Planted SDs recovered by >= ``frac`` reciprocal coverage in the
    final BED rows.  Tries both mate orders INCLUDING the chromosome
    swap — cross-chromosome SDs are canonically emitted with the mates
    ordered by (chrom, position), which may invert the planted order."""
    rows = []
    for ln in final_rows:
        f = ln.split("\t")
        rows.append((f[0], int(f[1]), int(f[2]), f[3], int(f[4]), int(f[5])))

    def ov(a, b):
        return max(0, min(a[1], b[1]) - max(a[0], b[0]))

    rec = 0
    for sd in planted:
        pa = (sd.a_start, sd.a_end)
        pb = (sd.b_start, sd.b_end)
        hit = False
        for (c1, s1, e1, c2, s2, e2) in rows:
            for (xc, x, yc, y) in (((c1), (s1, e1), (c2), (s2, e2)),
                                   ((c2), (s2, e2), (c1), (s1, e1))):
                if (xc == sd.chrom_a and yc == sd.chrom_b
                        and ov(x, pa) > frac * (pa[1] - pa[0])
                        and ov(y, pb) > frac * (pb[1] - pb[0])):
                    hit = True
                    break
            if hit:
                break
        rec += hit
    return rec


def write_fasta(path: str, chroms: dict[str, str], width: int = 80) -> None:
    with open(path, "w") as f:
        for name, seq in chroms.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")
