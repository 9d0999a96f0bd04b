#!/usr/bin/env python3
"""Generate the committed PQ fixture (graft/similarity/PqFixture.scala).

Coarse quantizer: per-label rounded mean of the integer-quantized
(floor(x*1e4)) sf0.01 embeddings. PQ codebooks: deterministic Lloyd
k-means (fixed seed, 25 iters, ties to lower index) per 16-dim
subspace, centroids rounded to integers. The OUTPUT is committed; this
script only documents where the constants came from (dev tooling —
driver-side python is allowed for tooling, not the library).

Usage: python3 tools/gen_pq_fixture.py > src/main/scala/graft/similarity/PqFixture.scala
"""
import numpy as np
import pyarrow.parquet as pq

M, KSUB, SEED, ITERS = 4, 8, 7, 25

t = pq.read_table('/root/testdata/sf0.01/embeddings.parquet').to_pandas()
q = np.floor(np.stack(t['embedding'].to_numpy()).astype(np.float64) * 1e4)
labels = t['label'].to_numpy()
dim = q.shape[1]
sub = dim // M

coarse = np.array([np.rint(q[labels == l].mean(axis=0))
                   for l in sorted(set(labels))], dtype=np.int64)


def lloyd(X, k, seed, iters):
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), k, replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                C[j] = X[a == j].mean(axis=0)
    return np.rint(C).astype(np.int64)

books = [lloyd(q[:, j*sub:(j+1)*sub], KSUB, SEED + j, ITERS) for j in range(M)]

# TRAINED IVF coarse quantizer (the production-default cells for
# Similarity.ivfTopKQ): Lloyd k-means on the FULL 64-dim quantized
# vectors, k=10, same deterministic recipe as the codebooks. The
# per-label `coarse` above stays as the sim_pq_adc fixture.
coarse_ivf = lloyd(q, 10, SEED, ITERS).astype(np.int64)

def fmt(v):
    return '    Seq(' + ', '.join(f'{int(x)}L' for x in v) + ')'

print('package graft.similarity')
print()
print('/** Committed PQ/IVF fixture: integer-valued coarse centroids (per-')
print('  * label rounded means of the quantized sf0.01 embeddings) and PQ')
print('  * codebooks (deterministic Lloyd k-means per 16-dim subspace,')
print('  * rounded) — generated once by tools/gen_pq_fixture.py. Integer')
print('  * values make every ADC/coarse distance exact integer arithmetic,')
print('  * so the IVFADC pipeline is DuckDB-oracle-checkable end to end')
print('  * (the sim_pq_adc row); KMeans-trained float codebooks stay the')
print('  * production path ([[Pq.train]]). coarseIvfL is the TRAINED (full')
print('  * 64-dim Lloyd, k=10) coarse quantizer behind the production-')
print('  * default ANN path Similarity.ivfTopKQ and its recall floor. */')
print('object PqFixture {')
print(f'  val m = {M}')
print(f'  val ksub = {KSUB}')
print('  val coarseL: Seq[Seq[Long]] = Seq(')
print(',\n'.join(fmt(c) for c in coarse) + ')')
print('  val codebooksL: Seq[Seq[Seq[Long]]] = Seq(')
for j, B in enumerate(books):
    print('    Seq(')
    print(',\n'.join('  ' + fmt(c) for c in B) + (')' if j == M-1 else '),'))
print('  )')
print('  val coarseIvfL: Seq[Seq[Long]] = Seq(')
print(',\n'.join(fmt(c) for c in coarse_ivf) + ')')
print('  val coarse: Seq[Seq[Double]] = coarseL.map(_.map(_.toDouble))')
print('  val codebooks: Seq[Seq[Seq[Double]]] =')
print('    codebooksL.map(_.map(_.map(_.toDouble)))')
print('}')
