"""Unigram pruning-criterion probe (r14 verdict ask #6): measure what
the trainer's expected-count pruning deviation from Kudo's algorithm 2
actually costs, by running BOTH criteria on the same golden corpus at
equal vocab size and comparing:

- final corpus log-likelihood (the EM objective — the quantity Kudo's
  exact likelihood-loss-on-removal criterion greedily protects),
- the kept-vocabulary overlap (Jaccard over multi-char pieces),
- encode parity (freq-weighted fraction of words whose Viterbi
  segmentation is identical under the two final models), and
- tokens-per-word fertility under each model.

Golden corpus: the driver's documents tables have a 31-word closed
vocabulary at every SF (measured r15 — any vocab ≥ 31 memorizes whole
words and both criteria trivially tie at fertility 1.0), so the probe
builds a deterministic synthetic MORPHOLOGICAL corpus instead: Zipf-
weighted stem×suffix words (seeded), the regime subword segmentation
exists for — the criteria must decide which morphemes to keep once
vocab < |words|. Seed inventory is kept small (the exact criterion is
O(|pieces|) corpus-LL evaluations per round — driver-side,
vocabulary-bounded, but quadratic-ish in vocab; that cost asymmetry is
itself part of the recorded result).

Run:  python tools/unigram_prune_probe.py   # ~1 min, driver-side math
Record the table in SCALING.md.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, ".")

from healthcare_aws_data_engineering_spark.operators import unigram as U

SEED_SIZE = 1_000
EM_ITERS = 2


def golden_freqs() -> dict[str, int]:
    """Deterministic morphological corpus: 40 seeded stems × 8 English
    suffixes, each (stem, suffix) pair kept with prob 0.5, Zipf counts
    by deterministic rank. ~160 distinct words over ~25 morpheme
    'true' pieces — vocab targets below |words| force the pruners to
    choose which morphemes survive."""
    rnd = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    stems = sorted(
        {
            "".join(rnd.choice(alphabet) for _ in range(rnd.randint(4, 7)))
            for _ in range(40)
        }
    )
    suffixes = ["", "s", "ing", "ed", "er", "ly", "tion", "ment"]
    words = [
        st + su for st in stems for su in suffixes if rnd.random() < 0.5
    ]
    return {w: max(2000 // (i + 1), 1) for i, w in enumerate(sorted(words))}


def fertility(freqs: dict[str, int], logp: dict[str, float]) -> float:
    toks = sum(
        n * len(U.viterbi_encode_word(w, logp)) for w, n in freqs.items()
    )
    return toks / sum(freqs.values())


def main() -> None:
    freqs = golden_freqs()
    n_tokens = sum(freqs.values())
    pieces = U.seed_pieces(freqs, max_piece_len=8, seed_size=SEED_SIZE)
    logp0 = U.em_fit(freqs, pieces, EM_ITERS)
    print(
        json.dumps(
            {
                "corpus": "synthetic stem x suffix (seed 42)",
                "distinct_words": len(freqs),
                "token_occurrences": n_tokens,
                "seed_pieces": len(pieces),
                "seed_ll_per_token": round(
                    U.corpus_loglik(freqs, logp0) / n_tokens, 4
                ),
            }
        ),
        flush=True,
    )
    for vocab in (60, 100):
        models = {}
        for crit in ("expected_count", "exact_loss"):
            t0 = time.perf_counter()
            models[crit] = U.prune_to_size(
                freqs, dict(logp0), vocab, criterion=crit
            )
            sec = round(time.perf_counter() - t0, 2)
            ll = U.corpus_loglik(freqs, models[crit])
            print(
                json.dumps(
                    {
                        "vocab": vocab,
                        "criterion": crit,
                        "prune_sec": sec,
                        "final_size": len(models[crit]),
                        "ll_per_token": round(ll / n_tokens, 4),
                        "fertility": round(
                            fertility(freqs, models[crit]), 4
                        ),
                    }
                ),
                flush=True,
            )
        a, b = models["expected_count"], models["exact_loss"]
        ma = {p for p in a if len(p) > 1}
        mb = {p for p in b if len(p) > 1}
        agree = sum(
            n
            for w, n in freqs.items()
            if U.viterbi_encode_word(w, a) == U.viterbi_encode_word(w, b)
        )
        print(
            json.dumps(
                {
                    "vocab": vocab,
                    "multi_vocab_jaccard": round(
                        len(ma & mb) / len(ma | mb), 4
                    ),
                    "encode_parity_freq_weighted": round(
                        agree / n_tokens, 4
                    ),
                    "ll_gap_pct": round(
                        100.0
                        * (
                            U.corpus_loglik(freqs, b)
                            - U.corpus_loglik(freqs, a)
                        )
                        / abs(U.corpus_loglik(freqs, a)),
                        4,
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
