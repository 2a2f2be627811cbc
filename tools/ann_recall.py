"""Measured banded-ANN recall harness (VERDICT r5 #3).

The ann_self_join_pairs docstring claims recall ~1 for near-identical
vectors and prescribes bits=64/bands=4 at n >= ~100k; this tool
MEASURES recall instead of asserting it: a planted-similarity corpus
(base gaussian vectors + controlled-cosine partners at targets
0.7/0.8/0.9/0.95/0.99) is run through ann_self_join_pairs and recall
is reported per (bits, threshold) as

    recall(thr) = |planted pairs with true cos >= thr found by the
                   banded join| / |planted pairs with true cos >= thr|

Planted pairs ARE the ground truth above 0.7: at dim=64 a random
cosine concentrates as ~N(0, 1/64), so non-planted pairs essentially
never reach the thresholds (the run also reports how many non-planted
pairs the verify stage admitted, as a sanity counter).

Config matches the docstring's sizing rule: bits=64 at n=100k (8-bit
buckets at that n would generate ~1.5e8 candidates — exactly the case
the rule exists to avoid); bits=32 measured at n=20k.

Usage: PYTHONPATH=/root/repo python tools/ann_recall.py [out.json]
Writes plans/r06/ann_recall_table.json by default.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def planted_corpus(n_base: int, n_planted_per_target: int, dim: int,
                   targets, seed: int = 7):
    """Base unit-ish gaussian vectors + partner vectors at controlled
    cosine: partner = c * v + sqrt(1-c^2) * orthogonalized noise.
    Returns (ids, vectors, planted) with planted = [(id_a, id_b,
    true_cos)]."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n_base, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    vecs = [X]
    ids = list(range(n_base))
    planted = []
    next_id = n_base
    for t_i, c in enumerate(targets):
        idx = rng.choice(n_base, size=n_planted_per_target, replace=False)
        V = X[idx]
        noise = rng.standard_normal((n_planted_per_target, dim))
        # orthogonalize noise against each partner base vector
        noise -= (noise * V).sum(axis=1, keepdims=True) * V
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        P = c * V + np.sqrt(max(0.0, 1 - c * c)) * noise
        true_cos = (P * V).sum(axis=1) / (
            np.linalg.norm(P, axis=1) * np.linalg.norm(V, axis=1))
        vecs.append(P)
        for j, base_id in enumerate(idx):
            pid = next_id + j
            a, b = sorted((int(base_id), pid))
            planted.append((a, b, float(true_cos[j])))
        ids.extend(range(next_id, next_id + n_planted_per_target))
        next_id += n_planted_per_target
    return ids, np.vstack(vecs), planted


def run(spark, n_base, n_planted, bits, thresholds, dim=64):
    import pandas as pd
    from pyspark.sql import functions as F

    from redisgraph_bulk_loader_spark.cache import release_pins
    from redisgraph_bulk_loader_spark.operators.similarity import (
        ann_self_join_pairs,
    )

    targets = (0.7, 0.8, 0.9, 0.95, 0.99)
    ids, V, planted = planted_corpus(n_base, n_planted, dim, targets)
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [row.tolist() for row in V]})
    corpus = spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<double>")
    out = {}
    for thr in thresholds:
        t0 = time.time()
        found = {
            (r["id_a"], r["id_b"])
            for r in ann_self_join_pairs(
                corpus, threshold=thr, bits=bits, bands=4, dim=dim
            ).collect()
        }
        release_pins()
        eligible = [(a, b) for a, b, c in planted if c >= thr]
        hit = sum((a, b) in found for a, b in eligible)
        # recall per planted target band: the docstring's claim is
        # specifically recall ~1 for NEAR-IDENTICAL vectors; milder
        # similarity trades recall for candidate volume by design
        by_target = {}
        for tc in targets:
            if tc < thr:
                continue
            band = [(a, b) for a, b, c in planted
                    if abs(c - tc) < 0.004 and c >= thr]
            if band:
                by_target[str(tc)] = round(
                    sum(p in found for p in band) / len(band), 4)
        out[str(thr)] = {
            "n_corpus": len(ids),
            "bits": bits,
            "planted_eligible": len(eligible),
            "planted_found": hit,
            "recall": round(hit / len(eligible), 4) if eligible else None,
            "recall_by_target_cos": by_target,
            "non_planted_found": len(found) - len(
                found & {(a, b) for a, b, _ in planted}),
            "wall_sec": round(time.time() - t0, 2),
        }
        print(f"bits={bits} n={len(ids)} thr={thr}: {out[str(thr)]}")
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06", "ann_recall_table.json")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = {
        # the documented >=100k operating point
        "bits64_n100k": run(spark, 90_000, 2_000, 64, (0.7, 0.8, 0.9)),
        # bench-scale configuration
        "bits32_n20k": run(spark, 14_000, 1_200, 32, (0.7, 0.8, 0.9)),
    }
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
