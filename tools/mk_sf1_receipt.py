#!/usr/bin/env python3
"""Merge the sf1 GateSweep subset (tools/bench_sf1_r16_raw.json) with
the round-16 sf0.1 full sweep into tools/bench_sf1_r16.json: per-gate
warm times at both SFs and the 10x-data scaling factor. The r15
verdict's #8 item: anything super-linear (factor >> 10) needs a named
reason or a fix.
"""
import json, sys

sf1 = json.load(open("tools/bench_sf1_r16_raw.json"))
sf01 = json.load(open(sys.argv[1] if len(sys.argv) > 1
                      else "tools/bench_all_gates_r16.json"))

t1, t01 = sf1["times"], sf01["times"]
rows = {}
for g, w1 in sorted(t1.items()):
    w01 = t01.get(g)
    if w01 is None or w01 <= 0 or w1 <= 0:
        continue
    rows[g] = {"sf0.1_warm_sec": w01, "sf1_warm_sec": round(w1, 3),
               "factor_at_10x_data": round(w1 / w01, 2)}

superlinear = {g: r for g, r in rows.items()
               if r["factor_at_10x_data"] > 12 and r["sf1_warm_sec"] > 3}

REASONS = {
    "ann_bruteforce": "O(queries x corpus) by definition - the exact "
        "baseline every ANN gate is judged against; corpus grew 10x so "
        "the scan does too (plus shuffle constant). The scale path IS "
        "the IVF family: ann_ivfpq at sf1 = 4.0s (8.5x, sublinear).",
    "dedup_containment": "exact set-overlap candidates grow with block "
        "occupancy^2; 10x docs -> ~10x denser prefix blocks -> >10x "
        "sweep work. By design the candidate bound REFUSES far past "
        "this (dedup_ngram_jaccard's exact strategy refused outright "
        "at sf1, see refused_at_sf1); the documented scale path is "
        "strategy='lsh' (banded candidates + exact verify).",
    "dedup_fuzzy": "same shape: edit-distance verify over prefix-key "
        "blocks whose occupancy grows ~10x; the blocking bound refuses "
        "past its envelope and the scale path is minhashVerifiedPairs.",
}
out = {"corpus": "/tmp/graft_sf1 (MakeScaledCorpus 10x of sf0.1: "
                 "key-shifted replicas, join selectivity preserved; "
                 "per-replica letter+digit rotation keeps length/"
                 "within-replica dup structure and kills cross-replica "
                 "similarity; k-times users over the same time range)",
       "gates_timed": len(rows),
       "superlinear_flags": superlinear,
       "superlinear_reasons": {g: REASONS.get(g, "UNEXPLAINED")
                               for g in superlinear},
       "refused_at_sf1": {
           "dedup_ngram_jaccard": "exact set-overlap candidate "
               "generation predicts ~1.29e9 weighted merge steps > "
               "maxCandidates=3e8 and refuses LOUDLY (the designed "
               "quadratic-sweep guard firing exactly where it should; "
               "strategy='lsh' is the documented scale path)"},
       "neardup_density_study":
           "tools/bench_sf1_r16_raw_neardup_corpus.json - the first "
           "corpus cut appended a per-replica suffix, making every "
           "replica a jaccard-0.95 near-dup of its original: dedup "
           "pair count grew ~45x/doc (dedup_fuzzy 638s) and the "
           "fuzzy/jaccard candidate bounds refused - kept as a "
           "dup-density stress receipt, not a scale receipt",
       "per_gate": rows}
json.dump(out, open("tools/bench_sf1_r16.json", "w"), indent=1)
print(json.dumps({"receipt": "tools/bench_sf1_r16.json",
                  "gates": len(rows),
                  "superlinear": sorted(superlinear)}))
