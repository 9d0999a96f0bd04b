#!/usr/bin/env python3
"""Parity REFERENCE for the in-engine PQ/IVF trainer (graft.similarity.Pq).

Every artifact in graft/similarity/PqFixture.scala is produced by the
ENGINE (Pq.trainCodebooksQ / Pq.trainCoarseQ / Pq.labelCentroidsQ, all
Spark); this script is the independent reimplementation of the same
recipe (like tools/train_bpe.py for the BPE trainer), and PqTrainSpec
pins the two byte-for-byte. The committed constants exist so the
DuckDB oracle can replay search over literal VALUES.

Recipe (identical on both sides, exact integer arithmetic throughout):
  - quantize: floor(x * 1e4) per component (int64);
  - init: the k rows with the smallest md5(f"{vec_id}:{tag}") hex
    digests, in digest order (engine-portable deterministic choice —
    no RNG implementation to match);
  - 25 Lloyd iterations: assign to argmin of exact integer squared
    distance, ties to the LOWER centroid index; update each non-empty
    centroid to the component-wise rounded mean, computed as
    floor((2*sum + n) / (2*n)) — round-half-up in pure integer math,
    so centroids stay int64 and every distance every iteration is
    exact (no float summation order anywhere);
  - empty clusters keep their previous centroid.
Per-label coarse centroids use the same integer rounded mean.

Usage: python3 tools/gen_pq_fixture.py > src/main/scala/graft/similarity/PqFixture.scala
"""
import hashlib

import numpy as np
import pyarrow.parquet as pq

M, KSUB, ITERS = 4, 8, 25

t = pq.read_table('/root/testdata/sf0.01/embeddings.parquet').to_pandas()
q = np.floor(np.stack(t['embedding'].to_numpy()).astype(np.float64) * 1e4)
q = q.astype(np.int64)
ids = t['vec_id'].to_numpy()
labels = t['label'].to_numpy()
dim = q.shape[1]
sub = dim // M


def round_mean(s, n):
    # floor((2s + n) / (2n)): round-half-up on exact integers
    return (2 * s + n) // (2 * n)


def init_rows(k, tag):
    order = sorted(range(len(ids)),
                   key=lambda i: hashlib.md5(
                       f"{ids[i]}:{tag}".encode()).hexdigest())
    return order[:k]


def lloyd_int(X, k, tag, iters):
    C = X[init_rows(k, tag)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # int64 exact
        a = d.argmin(axis=1)  # ties -> lower index
        for j in range(k):
            sel = X[a == j]
            if len(sel):
                C[j] = round_mean(sel.sum(axis=0), len(sel))
    return C


coarse = np.array([round_mean(q[labels == l].sum(axis=0),
                              int((labels == l).sum()))
                   for l in sorted(set(labels))], dtype=np.int64)

books = [lloyd_int(q[:, j * sub:(j + 1) * sub], KSUB, f"pq{j}", ITERS)
         for j in range(M)]

# TRAINED IVF coarse quantizer (the production-default cells for
# Similarity.ivfTopKQ): same integer Lloyd on the FULL 64-dim vectors.
coarse_ivf = lloyd_int(q, 10, "coarse", ITERS)


def fmt(v):
    return '    Seq(' + ', '.join(f'{int(x)}L' for x in v) + ')'


print('package graft.similarity')
print()
print('/** Committed PQ/IVF fixture — the output of the IN-ENGINE trainer')
print('  * ([[Pq.trainCodebooksQ]] / [[Pq.trainCoarseQ]] /')
print('  * [[Pq.labelCentroidsQ]]) on the sf0.01 embeddings: integer-valued')
print('  * per-label coarse centroids, PQ codebooks (integer Lloyd k-means')
print('  * per 16-dim subspace), and the trained full-dim IVF coarse')
print('  * quantizer behind the production-default ANN path')
print('  * Similarity.ivfTopKQ and its recall floor. Integer values make')
print('  * every ADC/coarse distance exact integer arithmetic, so the')
print('  * IVFADC pipeline is DuckDB-oracle-checkable end to end (the')
print('  * sim_pq_adc row). tools/gen_pq_fixture.py is the independent')
print('  * parity reference for the trainer (PqTrainSpec pins equality);')
print('  * re-run either side to re-index a drifted corpus. */')
print('object PqFixture {')
print(f'  val m = {M}')
print(f'  val ksub = {KSUB}')
print('  val coarseL: Seq[Seq[Long]] = Seq(')
print(',\n'.join(fmt(c) for c in coarse) + ')')
print('  val codebooksL: Seq[Seq[Seq[Long]]] = Seq(')
for j, B in enumerate(books):
    print('    Seq(')
    print(',\n'.join('  ' + fmt(c) for c in B) + (')' if j == M - 1 else '),'))
print('  )')
print('  val coarseIvfL: Seq[Seq[Long]] = Seq(')
print(',\n'.join(fmt(c) for c in coarse_ivf) + ')')
print('  val coarse: Seq[Seq[Double]] = coarseL.map(_.map(_.toDouble))')
print('  val codebooks: Seq[Seq[Seq[Double]]] =')
print('    codebooksL.map(_.map(_.map(_.toDouble)))')
print('}')
