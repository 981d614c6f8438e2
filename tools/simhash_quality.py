"""SimHash banded-search quality measurement: recall of
`simhash_candidate_pairs` against injected near-duplicates at controlled
edit rates — the SimHash companion to `tools/dedup_quality.py` (MinHash)
and `tools/semdedup_quality.py` (embedding cells).

    python tools/simhash_quality.py [--sf-dir /root/testdata/sf0.01]

Method: inject one mutated copy per (doc, edit-rate) with the same
token-replacement process as dedup_quality, run the EXACT graded pipeline
(`simhash(32 bits) → 4-band block join → popcount ≤ max_hamming`), and
report per edit rate:

* mean Hamming distance between original and mutated signatures (how fast
  the 32-bit signature drifts with token edits);
* candidate recall (pair shares ≥1 of 4 blocks — guaranteed 1.0 whenever
  the true distance ≤ 3, the pigeonhole bound);
* verified recall at the graded max_hamming=3 and at a loose 8.

Deterministic: fixed RNG seed. Output mirrored into README's measurement
section when re-run.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

from dedup_quality import build_corpus  # noqa: E402 — shares the injection process


def measure(sf_dir: str, n_docs: int = 300):
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.dedup import simhash, simhash_candidate_pairs
    from smart_data_lake_spark.session import build_session

    spark = build_session(app_name="simhash_quality")
    edit_rates = [0.02, 0.05, 0.1, 0.2]
    df, truth = build_corpus(sf_dir, spark, n_docs, edit_rates)

    sig_df = simhash(df).localCheckpoint()  # ONE corpus pass, reused below
    sigs = {r["doc_id"]: r["simhash"] for r in sig_df.collect()}
    loose = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_candidate_pairs(df, max_hamming=32, signatures=sig_df).collect()
    }  # max_hamming=32 disables the verify filter -> pure candidate set
    tight = {p: h for p, h in loose.items() if h <= 3}
    loose8 = {p: h for p, h in loose.items() if h <= 8}

    lines = [
        f"corpus: {n_docs} real docs + {len(truth)} injected near-dups, "
        "simhash 32 bits / 4 bands (8 bits per block)",
        "",
        "| edit rate | injected | mean hamming | candidate recall | recall @ham≤3 | recall @ham≤8 |",
        "|---|---|---|---|---|---|",
    ]
    for e in edit_rates:
        pairs = [p for p, pe in truth.items() if pe == e]
        hams = [bin(sigs[a] ^ sigs[b]).count("1") for a, b in pairs]
        mean_h = sum(hams) / len(hams)
        in_cand = sum(1 for p in pairs if p in loose)
        in_t = sum(1 for p in pairs if p in tight)
        in_l = sum(1 for p in pairs if p in loose8)
        lines.append(
            f"| {e:.2f} | {len(pairs)} | {mean_h:.1f} | {in_cand/len(pairs):.3f} "
            f"| {in_t/len(pairs):.3f} | {in_l/len(pairs):.3f} |"
        )
    # pigeonhole sanity: every true pair within hamming 3 MUST be a candidate
    missed_guaranteed = [
        (a, b)
        for (a, b) in truth
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3 and (a, b) not in loose
    ]
    lines += [
        "",
        f"pigeonhole check: {len(missed_guaranteed)} pairs within hamming ≤ 3 missed "
        "by the 4-band join (must be 0 — the completeness guarantee)",
    ]
    assert not missed_guaranteed, missed_guaranteed
    return "\n".join(lines)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--n-docs", type=int, default=300)
    args = ap.parse_args()
    print(measure(args.sf_dir, args.n_docs))
