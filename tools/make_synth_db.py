#!/usr/bin/env python3
"""Generate a deterministic synthetic protein database in FASTA format.

The headline parity/bench fixture of the reference
(test_data/db/uniprot_sprot12071.fasta — the first 12071 Swiss-Prot entries,
~4.2M residues) is absent from the mounted snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so benchmarks use a synthetic stand-in
with a Swiss-Prot-like length distribution (lognormal, median ~290, clipped
to [30, 5000]) and natural amino-acid frequencies. Fixed seed => identical
bytes everywhere.

Usage: make_synth_db.py OUT.fasta [n_seqs] [seed]
"""
import sys

import numpy as np

# Natural amino-acid frequencies (UniProt statistics, order matches the
# 20 standard letters below).
AA = "ALGVESIKRDTPNQFYMHCW"
FREQ = np.array([
    8.25, 9.65, 7.07, 6.86, 6.72, 6.63, 5.91, 5.80, 5.53, 5.46,
    5.35, 4.73, 4.06, 3.93, 3.86, 2.92, 2.41, 2.27, 1.38, 1.10,
])
FREQ = FREQ / FREQ.sum()


def make_db(n_seqs: int = 12071, seed: int = 12071):
    rng = np.random.default_rng(seed)
    lengths = np.clip(
        rng.lognormal(mean=5.67, sigma=0.65, size=n_seqs), 30, 5000
    ).astype(int)
    seqs = []
    for L in lengths:
        idx = rng.choice(len(AA), size=int(L), p=FREQ)
        seqs.append("".join(AA[i] for i in idx))
    return seqs


def make_db_arrays(n_seqs: int = 541762, seed: int = 541762):
    """Vectorized generator for benchmark-scale databases (full-Swiss-Prot
    size, ~1.93e8 residues at the default n): returns a list of uint8 ASCII
    arrays (map through ScoreMatrix.letter_index() for engine input).
    Same length/composition distributions as make_db; one draw stream."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(
        rng.lognormal(mean=5.67, sigma=0.65, size=n_seqs), 30, 5000
    ).astype(np.int64)
    total = int(lengths.sum())
    aa_codes = np.frombuffer(AA.encode(), dtype=np.uint8)
    cum = np.cumsum(FREQ)
    residues = aa_codes[np.searchsorted(cum, rng.random(total))]
    bounds = np.cumsum(lengths)[:-1]
    return np.split(residues, bounds)


def write_fasta(path: str, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">synth|{i:06d} synthetic sequence len={len(s)}\n")
            for j in range(0, len(s), 60):
                f.write(s[j : j + 60] + "\n")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "synth12071.fasta"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12071
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 12071
    seqs = make_db(n, seed)
    write_fasta(out, seqs)
    print(f"{out}: {len(seqs)} sequences, {sum(map(len, seqs))} residues")
