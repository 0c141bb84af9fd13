"""MinHash/LSH quality: candidate recall vs exact Jaccard ground truth."""

from __future__ import annotations

import random

from kgspark.operators import dedup


def _mk_docs(n: int = 120, seed: int = 9):
    """Docs with planted near-duplicate pairs (small token edits)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    for i in range(n):
        words = [rng.choice(vocab) for _ in range(50)]
        docs.append((i, " ".join(words)))
        if i % 4 == 0:  # plant a near-dup: mutate one word (J ≈ 0.89,
            # where 4 bands × 4 rows gives ~0.97 candidate probability)
            mutated = list(words)
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            docs.append((1000 + i, " ".join(mutated)))
    return docs


def test_lsh_recall_against_exact_jaccard(spark):
    docs = spark.createDataFrame(_mk_docs(), "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.85, shingle_n=3).collect()
    }
    assert exact, "fixture must contain true near-dup pairs"
    sigs = dedup.minhash_signatures(docs, num_hashes=16, shingle_n=3)
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(cand))


def test_exact_dedup_groups(spark):
    rows = [(1, "a b  c"), (2, "A b c"), (3, "different text"), (4, "a B C")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.dup_count) for r in dedup.exact_dedup(docs).collect()}
    assert got == {(1, 3), (3, 1)}


def test_simhash_near_identical_docs_collide(spark):
    rows = [(1, "alpha beta gamma delta " * 10), (2, "alpha beta gamma delta " * 10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sims[1] == sims[2]
    groups = dedup.simhash_dup_groups(dedup.simhash(docs)).collect()
    assert len(groups) == 1 and groups[0].bucket_size == 2
