"""End-to-end genotype-panel workflow: PLINK ingest → LD screen →
missing-data r² → query-panel lookup.

The domain the reference was built for (SURVEY.md §1: genotype indicator
bitmaps), walked the way a geneticist would: load a .bed, screen for LD
pairs, handle missingness exactly, and look a new panel's variants up
against the reference panel.

Run: python examples/genotypes.py  (CPU-friendly; tiny synthetic panel)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from stormtpu import (
    cross_topk_neighbors,
    pairs_above,
    similarity_matrix_complete,
)
from stormtpu.io import load_plink_bed

# --- write a tiny synthetic PLINK1 .bed (SNP-major) ---------------------
rng = np.random.default_rng(1)
n_variants, n_samples = 300, 257
# 2-bit codes: 0 hom-A1, 1 missing, 2 het, 3 hom-A2 (~5% missing)
codes = rng.choice([0, 2, 3], size=(n_variants, n_samples), p=[0.55, 0.3, 0.15])
codes[rng.random(codes.shape) < 0.05] = 1
# plant an LD block: variants 10..14 copy variant 10's genotypes
for v in range(11, 15):
    codes[v] = codes[10]

bpv = (n_samples + 3) // 4
body = bytearray(b"\x6c\x1b\x01")
for vi in range(n_variants):
    row = bytearray(bpv)
    for si in range(n_samples):
        row[si // 4] |= int(codes[vi, si]) << (2 * (si % 4))
    body += row
bed = os.path.join(tempfile.mkdtemp(), "panel.bed")
with open(bed, "wb") as f:
    f.write(bytes(body))

# --- ingest: carrier bitmaps + observed-mask bitmaps --------------------
carriers = load_plink_bed(bed, n_samples, n_variants)  # ≥1 A2 allele
missing = load_plink_bed(bed, n_samples, n_variants, encode="missing")

# the observed mask is simply NOT missing; carriers already has missing
# positions cleared (code 1 sets no bit), as similarity_matrix_complete
# requires
from stormtpu.layout import BitMatrix, unpack_bits

mask = BitMatrix.from_dense(1 - unpack_bits(missing.packed, n_samples))

# --- LD screen: r² over the fully-observed approximation ---------------
ii, jj, r2 = pairs_above(carriers, 0.8, measure="r2")
print(f"LD screen (r² ≥ 0.8): {ii.size} pairs")
print("  planted block pairs found:",
      sorted({(a, b) for a, b in zip(ii.tolist(), jj.tolist())
              if 10 <= a <= 14 and 10 <= b <= 14}))

# --- exact missing-data handling: pairwise-complete r² ------------------
r2c = similarity_matrix_complete(carriers, mask, "r2")
print(f"pairwise-complete r²(10, 11) = {r2c[10, 11]:.4f} "
      f"(universe = co-observed samples only)")

# the same statistic as a device screen (no N² float64 matrix):
from stormtpu import pairs_above_complete

ci, cj, cr2 = pairs_above_complete(carriers, mask, 0.8, measure="r2")
print(f"pairwise-complete screen (r² ≥ 0.8): {ci.size} pairs "
      f"(matrix form agrees: {int((np.triu(r2c, 1) >= 0.8).sum())})")

# --- query panel lookup: new variants against the reference panel ------
q_codes = codes[rng.choice(n_variants, 8, replace=False)]
q_dense = (q_codes >= 2).astype(np.uint8)
queries = BitMatrix.from_dense(q_dense)
vals, idx = cross_topk_neighbors(queries, carriers, k=3)
print("query-panel lookup (top-3 reference variants per query):")
for r in range(queries.n):
    print(f"  query {r}: partners {idx[r].tolist()} counts {vals[r].tolist()}")

# --- aggregate statistics: marginals/distribution of C without C --------
# (at biobank scale C can never materialize; these are O(N) / O(n_bins))
from stormtpu import count_histogram, count_row_sums

rs = count_row_sums(carriers, include_self=False)
hot = int(np.argmax(rs))
hist = count_histogram(carriers, n_bins=12)
occupied = int((hist["hist"] > 0).sum())
print(f"aggregates: variant {hot} has the largest total co-carrier mass "
      f"({int(rs[hot])}); pair-count histogram occupies {occupied}/12 bins "
      f"(mass {hist['pairs']} pairs, conserved)")

# --- clumping: collapse the screen into leader-led LD clumps ------------
# (PLINK --clump shape: most significant unassigned variant leads, absorbs
# every unassigned partner above the threshold)
from stormtpu import clump

stat = rng.random(n_variants) * 8          # stand-in assoc -log10 p
stat[12] = 9.0                             # make a planted-block row lead
res = clump(carriers, stat, 0.8, measure="r2")
lead = int(res.leaders[0])
print(f"clumps: {res.n_clumps} over {n_variants} variants; "
      f"top clump led by {lead} with members {res.members(lead).tolist()}")
assert lead == 12 and set(range(10, 15)) <= set(res.members(lead).tolist())

# --- panel growth: new variants arrive; nothing requadrates -------------
# (r5: a biobank panel grows over time — streamed results and query
# checkpoints EXTEND, reusing everything the old rows already paid for)
from stormtpu.stream_query import (
    extend_stream_pairs_above,
    stream_pairs_above,
)

new_codes = rng.choice([0, 2, 3], size=(60, n_samples), p=[0.55, 0.3, 0.15])
grown = BitMatrix.from_dense(
    np.concatenate([unpack_bits(carriers.packed, n_samples),
                    (new_codes >= 2).astype(np.uint8)]))
ckpt = os.path.join(tempfile.mkdtemp(), "screen")
stream_pairs_above(carriers, 0.8, measure="r2", out_dir=ckpt)
gi, gj, gr2 = extend_stream_pairs_above(grown, ckpt)
fresh = stream_pairs_above(grown, 0.8, measure="r2")
assert np.array_equal(gi, fresh[0]) and np.array_equal(gr2, fresh[2])
new_pairs = int(((gi >= n_variants) | (gj >= n_variants)).sum())
print(f"panel growth: {n_variants}→{grown.n} variants; extended screen "
      f"has {gi.size} pairs ({new_pairs} involving new variants), exact "
      f"— old-range stripe files reused, no requadration")
