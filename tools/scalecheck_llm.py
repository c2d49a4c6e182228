"""Scale experiment: LLM-dedup operators at corpus scale.

The driver testdata tops out at 5 000 documents (sf0.1) — far below
the corpus scale the dedup pipeline targets — so this experiment
synthesizes documents AT scale with spark.range (token ids from
xxhash64, pure Catalyst — no Python in the data path) and times the
production dedup plans end-to-end through a noop sink:

  - minhash64: shingle → 64-permutation affine MinHash signature →
    LSH band buckets → candidate pairs (operators/dedup.py)
  - simhash: 32-bit fingerprints (operators/dedup.py)
  - exact: md5-digest exact-dup pairs (operators/dedup.py)

Each doc is ~60 tokens over a 50k vocabulary with a 1-in-50 chance of
being a near-duplicate of a base doc (same prefix, one token swapped),
so the LSH path has real candidates to surface.

Usage: python tools/scalecheck_llm.py [n_docs_millions]
Prints one JSON line; human summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.session import get_spark
from deepicedrain_spark.operators import dedup as dd

N_DOCS = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 1_000_000
TOKENS = 60
VOCAB = 50_000


def synth(spark):
    """(doc_id, text): ~TOKENS words each; every 50th doc duplicates
    doc_id-1's token stream except one position — a planted near-dup."""
    rows = spark.range(N_DOCS)
    base = F.when(F.col("id") % 50 == 0, F.col("id") - 1).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.when(
                (F.col("id") % 50 == 0) & (i == 7),
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(99)), F.lit(VOCAB)),
            ).otherwise(F.pmod(F.xxhash64(base, i), F.lit(VOCAB))),
        ),
    )
    return rows.select(F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text"))


def run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    spark = get_spark("scalecheck_llm")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth(spark)

    shingled = dd.word_shingles(docs).localCheckpoint()
    t_shingle = run(shingled)

    sigs = dd.minhash_signature(shingled, "shingles", "doc_id", 64)
    t_sig = run(sigs)

    cands = dd.lsh_candidate_pairs(
        dd.minhash_signature(shingled, "shingles", "doc_id", 64), "doc_id", 64, 16
    )
    t0 = time.time()
    n_cands = cands.count()
    t_cands = time.time() - t0

    t_simhash = run(dd.simhash(docs, bits=32))
    t_exact = run(dd.exact_duplicates(docs))

    out = {
        "metric": "llm_dedup_scale",
        "n_docs": N_DOCS,
        "tokens_per_doc": TOKENS,
        "shingle_sec": round(t_shingle, 1),
        "minhash_sig_sec": round(t_sig, 1),
        "lsh_candidates_sec": round(t_cands, 1),
        "n_candidates": n_cands,
        "simhash_sec": round(t_simhash, 1),
        "exact_dedup_sec": round(t_exact, 1),
        "docs_per_sec_sig": round(N_DOCS / t_sig),
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
