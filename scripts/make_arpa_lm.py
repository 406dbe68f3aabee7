#!/usr/bin/env python
"""Host-side n-gram LM trainer: text corpus -> ARPA file.

Fills the KenLM-training role for environments without kenlm binaries
(the reference trains its .arpa with the kenlm docker,
``/root/reference/ckpt/lm/readme.md:14-19``; the native decoder here only
READS the .arpa, ``native/ctc_decoder/ctc_beam_search.cpp:64-163``).
Interpolated absolute discounting (Kneser-Ney style discount, raw counts
at every order) with standard backoff-weight normalization — a real
count-and-backoff estimator, small enough to audit, scaling to
millions of n-grams.

Usage:
  python scripts/make_arpa_lm.py --text corpus.txt --order 3 --out lm.arpa
  python scripts/make_arpa_lm.py --manifest train.json --order 3 --out lm.arpa

``--manifest`` reads JSONL rows with a "text" field (our manifest schema).
Validation: ``--heldout`` computes perplexity through the same backoff
recursion the C++ scorer uses.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from collections import Counter
from pathlib import Path

BOS, EOS, UNK = "<s>", "</s>", "<unk>"


def read_sentences(args) -> list:
    sents = []
    if args.text:
        for line in Path(args.text).read_text().splitlines():
            w = line.split()
            if w:
                sents.append(w)
    if args.manifest:
        for line in Path(args.manifest).read_text().splitlines():
            if line.strip():
                w = json.loads(line)["text"].split()
                if w:
                    sents.append(w)
    return sents


def train_arpa(sentences, order: int = 3, min_count=None):
    """Return ``{n: {ngram_tuple: (log10_p, log10_bow|None)}}``.

    Absolute discounting with the Ney estimate D_n = n1/(n1+2*n2) per order,
    backoff (not interpolated) — the classic ARPA-compatible formulation:

      P(w|h) = (c(hw) - D)/c(h)            if c(hw) > 0
             = bow(h) * P(w|h')            otherwise
      bow(h) = D*N1+(h.)/c(h) / sum_{w: c(hw)=0} P(w|h')
    """
    min_count = min_count or {}
    counts = [Counter() for _ in range(order + 1)]  # counts[n] over n-grams
    for words in sentences:
        toks = [BOS] + words + [EOS]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                if n == 1 and toks[i] == BOS:
                    continue  # <s> never predicted => no unigram count
                counts[n][tuple(toks[i:i + n])] += 1
    # prune rare high-order n-grams if asked (keeps files bounded on big text)
    for n in range(2, order + 1):
        mc = min_count.get(n, 1)
        if mc > 1:
            counts[n] = Counter({g: c for g, c in counts[n].items() if c >= mc})

    # Ney discount per order from count-of-count statistics
    D = {}
    for n in range(1, order + 1):
        cc = Counter(counts[n].values())
        n1, n2 = cc.get(1, 0), cc.get(2, 0)
        D[n] = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5

    vocab = sorted({g[0] for g in counts[1]}) + [UNK]
    V = len(vocab)
    total_uni = sum(counts[1].values())

    # unigrams: discounted ML, leftover mass spread to <unk> (uniform would
    # also be valid; a single <unk> matches the decoder's OOV mapping,
    # ctc_beam_search.cpp:472)
    probs = [dict() for _ in range(order + 1)]  # ngram -> prob (linear)
    left = D[1] * sum(1 for c in counts[1].values() if c > 0) / total_uni
    for g, c in counts[1].items():
        probs[1][g] = max(c - D[1], 0.0) / total_uni
    probs[1][(UNK,)] = max(left, 1e-10)

    bows = [dict() for _ in range(order + 1)]  # history-tuple -> bow (linear)

    def p_full(g):
        """Full backoff-model P(w|h) (linear) for orders already finalized.

        Orders are built bottom-up, so when estimating order-n bows every
        order < n is complete — this is the exact quantity the bow
        denominator needs (1 - sum over SEEN words of the lower-order
        model's probability)."""
        k = len(g)
        if g in probs[k]:
            return probs[k][g]
        if k == 1:
            return probs[1][(UNK,)]
        bo = bows[k - 1].get(g[:-1], 1.0)
        return bo * p_full(g[1:])
    for n in range(2, order + 1):
        # histories = (n-1)-grams that begin at least one n-gram
        hist_count = Counter()
        succ = {}
        for g, c in counts[n].items():
            h = g[:-1]
            hist_count[h] += c
            succ.setdefault(h, []).append((g, c))
        for h, ch in hist_count.items():
            n1plus = len(succ[h])
            for g, c in succ[h]:
                probs[n][g] = max(c - D[n], 0.0) / ch
            # backoff weight: leftover mass / lower-order mass of unseen words
            num = D[n] * n1plus / ch
            seen_lower = sum(p_full(g[1:]) for g, _ in succ[h])
            denom = max(1.0 - seen_lower, 1e-10)
            bows[n - 1][h] = max(num / denom, 1e-10)

    # assemble ARPA tables: entry = (log10 p, log10 bow or None)
    tables = {}
    for n in range(1, order + 1):
        t = {}
        for g, p in probs[n].items():
            bow = bows[n].get(g) if n < order else None
            t[g] = (math.log10(max(p, 1e-99)),
                    math.log10(bow) if bow is not None else None)
        # histories that only back off (never predicted) still need a row so
        # their bow is reachable: give them logp -99 (ARPA convention)
        if n < order:
            for h in bows[n]:
                if h not in t:
                    t[h] = (-99.0, math.log10(bows[n][h]))
        tables[n] = t
    # <s> is context-only: conventionally listed with logp -99
    if (BOS,) not in tables[1]:
        tables[1][(BOS,)] = (-99.0, math.log10(bows[1].get((BOS,), 1.0))
                             if order > 1 else None)
    return tables, V


def write_arpa(tables, out_path):
    order = max(tables)
    with open(out_path, "w") as f:
        f.write("\\data\\\n")
        for n in range(1, order + 1):
            f.write(f"ngram {n}={len(tables[n])}\n")
        for n in range(1, order + 1):
            f.write(f"\n\\{n}-grams:\n")
            for g in sorted(tables[n]):
                logp, bow = tables[n][g]
                line = f"{logp:.6f}\t{' '.join(g)}"
                if bow is not None:
                    line += f"\t{bow:.6f}"
                f.write(line + "\n")
        f.write("\n\\end\\\n")


def _score_ngram(tables, g):
    """log10 P(g[-1] | g[:-1]) with the SAME backoff recursion as the C++
    scorer (ctc_beam_search.cpp:139-156)."""
    n = len(g)
    if g in tables[n]:
        return tables[n][g][0]
    if n == 1:
        return tables[1][(UNK,)][0]
    h = g[:-1]
    entry = tables[len(h)].get(h)
    bo = entry[1] if (entry is not None and entry[1] is not None) else 0.0
    return bo + _score_ngram(tables, g[1:])


def score_word(tables, hist, w, order):
    hist = hist[-(order - 1):] if order > 1 else []
    return _score_ngram(tables, tuple(hist) + (w,))


def perplexity(tables, sentences, order):
    lp, n_words = 0.0, 0
    for words in sentences:
        hist = [BOS]
        for w in words + [EOS]:
            ww = w if (w,) in tables[1] else UNK
            lp += score_word(tables, hist, ww, order)
            hist.append(ww)
            n_words += 1
    return 10 ** (-lp / max(n_words, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default=None, help="one sentence per line")
    ap.add_argument("--manifest", default=None, help="JSONL manifest with 'text'")
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--heldout", default=None,
                    help="text file for perplexity validation")
    ap.add_argument("--min_count3", type=int, default=1,
                    help="prune 3-grams (and higher) below this count")
    args = ap.parse_args()
    sents = read_sentences(args)
    if not sents:
        sys.exit("no sentences found")
    mc = {n: args.min_count3 for n in range(3, args.order + 1)}
    tables, V = train_arpa(sents, args.order, mc)
    write_arpa(tables, args.out)
    stats = {f"ngram_{n}": len(tables[n]) for n in tables}
    stats.update(sentences=len(sents), vocab=V,
                 size_mb=round(Path(args.out).stat().st_size / 1e6, 2))
    if args.heldout:
        held = [l.split() for l in Path(args.heldout).read_text().splitlines()
                if l.split()]
        stats["heldout_ppl"] = round(perplexity(tables, held, args.order), 2)
        stats["train_ppl"] = round(perplexity(tables, sents[:2000], args.order), 2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
