"""Brute-force exact BM25 oracle (FIXTURES.md §3).

Scores ALL matching docs in plain python/numpy dicts — no codec, no
blocks, no Spark — the independent implementation the distributed
WAND/codec path must match rank- and score-identically (tol 1e-6).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from groonga_spark.normalize import normalize_str
from groonga_spark.ql import And, Near, Not, Or, Phrase, Similar, Term, parse_query
from groonga_spark.tokenize import tokenize_str

K1, B = 1.2, 0.75


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], mode: str,
                 scorer: str = "bm25"):
        self.mode = mode
        self.scorer = scorer
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.dl: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize_str(normalize_str(text or ""), mode)
            self.dl[doc_id] = len(toks)
            for term, pos in toks:
                self.postings[term].setdefault(doc_id, []).append(pos)
        self.n_docs = len(docs)
        self.avgdl = sum(self.dl.values()) / max(1, self.n_docs)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_term(self, term: str) -> dict[int, float]:
        out = {}
        w = self.idf(term)
        for d, plist in self.postings.get(term, {}).items():
            tf = float(len(plist))
            if self.scorer == "tf_idf":  # [G: lib/scorer.c scorer_tf_idf]
                out[d] = w * tf
                continue
            dl = float(self.dl[d])
            out[d] = w * tf / (tf + K1 * (1 - B + B * dl / self.avgdl))
        return out

    def _leaf(self, text: str) -> dict[int, float] | None:
        toks = [t for t, _ in tokenize_str(normalize_str(text), self.mode)]
        if not toks or any(t not in self.postings for t in toks):
            return {}
        # docs containing all tokens, scored by the ONE shared block
        # (per-doc scores are independent, so adjacency filters after)
        base = self._leaf_docs_all(toks)
        if len(toks) > 1:
            ok = set()
            for d in base:
                acc = set(self.postings[toks[0]][d])
                for i in range(1, len(toks)):
                    acc &= {p - i for p in self.postings[toks[i]][d]}
                    if not acc:
                        break
                if acc:
                    ok.add(d)
            return {d: s for d, s in base.items() if d in ok}
        return base

    def _near(self, text: str, max_interval: int) -> dict[int, float]:
        toks = [t for t, _ in tokenize_str(normalize_str(text), self.mode)]
        if not toks or any(t not in self.postings for t in toks):
            return {}
        base = self._leaf_docs_all(toks)
        out = {}
        for d, sco in base.items():
            plists = [self.postings[t][d] for t in toks]
            starts = sorted(p for pl in plists for p in pl)
            for p in starts:
                if all(any(p <= q <= p + max_interval for q in pl)
                       for pl in plists):
                    out[d] = sco
                    break
        return out

    def _leaf_docs_all(self, toks) -> dict[int, float]:
        """docs containing ALL tokens (no adjacency) — THE shared
        intersect-and-score block (_leaf adds adjacency on top): sum
        per-token scores in sorted-unique-token order with duplicate
        counts as weights (term-id order == term order since ids are
        rank-of-term) — the determinism contract both paths share."""
        docsets = [set(self.postings[t]) for t in toks]
        cand = set.intersection(*docsets)
        counts = Counter(toks)
        out = defaultdict(float)
        for t in sorted(counts):
            st = self.score_term(t)
            for d in cand:
                out[d] += counts[t] * st[d]
        return dict(out)

    SIMILAR_MAX_TERMS = 30  # mirrors FulltextIndex.SIMILAR_MAX_TERMS

    def _similar(self, text: str) -> dict[int, float]:
        toks = [t for t, _ in tokenize_str(normalize_str(text), self.mode)]
        # rare-term selection: distinct KNOWN tokens ranked (df asc,
        # term asc), top SIMILAR_MAX_TERMS — mirrors _expand_ast
        known = sorted(t for t in set(toks) if t in self.postings)
        sel = sorted(known, key=lambda t: (len(self.postings[t]), t))
        sel = sel[: self.SIMILAR_MAX_TERMS]
        acc = defaultdict(float)
        for t in sorted(sel):
            for d, s in self.score_term(t).items():
                acc[d] += s
        return dict(acc)

    def eval(self, node) -> dict[int, float]:
        if node is None:
            return {}
        if isinstance(node, Near):
            return self._near(node.text, node.max_interval)
        if isinstance(node, Similar):
            return self._similar(node.text)
        if isinstance(node, (Term, Phrase)):
            return self._leaf(node.text)
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            acc = None
            for c in pos:
                r = self.eval(c)
                if acc is None:
                    acc = r
                else:
                    acc = {d: acc[d] + r[d] for d in acc.keys() & r.keys()}
            acc = acc or {}
            for c in neg:
                bad = self.eval(c).keys()
                acc = {d: s for d, s in acc.items() if d not in bad}
            return acc
        if isinstance(node, Or):
            acc: dict[int, float] = defaultdict(float)
            for c in node.children:
                for d, s in self.eval(c).items():
                    acc[d] += s
            return dict(acc)
        if isinstance(node, Not):
            return {}
        raise TypeError(type(node))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        scores = self.eval(parse_query(query))
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def match_count(self, query: str) -> int:
        return len(self.eval(parse_query(query)))
