"""jieba-compatible CJK segmentation: prefix-dict DAG + max-prob route +
HMM (BMES Viterbi) for out-of-dictionary words.

The reference tokenizes with ``jieba.lcut`` (tools/words.py:29-43); jieba
itself is not installed in this container, so this module implements the
published algorithm jieba documents (README "算法"):

1. a prefix dictionary holding every word AND every proper prefix (freq 0
   marker), so the DAG scan is one dict probe per extension;
2. for each sentence, a DAG mapping start index -> feasible word ends;
3. dynamic programming right-to-left for the max-log-prob route
   (``route[i] = max_j (log f(w_ij) - log total + route[j+1])``, ties
   broken toward the longer word exactly like CPython ``max`` over
   ``(prob, j)`` tuples);
4. runs of single characters the route could not merge are handed to a
   BMES hidden-Markov Viterbi decode that discovers unseen words — the
   jieba ``finalseg`` step.

One documented approximation: jieba ships HMM tables pre-trained on a
segmented news corpus (its ``prob_emit.py`` etc. — data files, not
algorithm). Those files are absent here, so the same MLE estimation is
run over the broadcast dictionary itself (each word contributes its BMES
label sequence; word-final states hand off to word-initial states via the
start distribution). The estimator, decoder, and control flow are the
published algorithm; only the training corpus differs, and the whole
thing is deterministic given the dictionary.

FMM (operators/wordfreq.py) remains the default dictionary mode; this
segmenter is selected with ``segmenter="dag_hmm"``.
"""

from __future__ import annotations

import math
import re

_HAN_BLOCK = re.compile(r"([一-鿿a-zA-Z0-9+#&._%\-]+)")
_SKIP = re.compile(r"(\r\n|\s)")
_ENG = re.compile(r"[a-zA-Z0-9]+")
_HAN_ONLY = re.compile(r"([一-鿿]+)")
_NUM_ENG = re.compile(r"(\d+\.\d+|[a-zA-Z0-9]+)")

_MIN_FLOAT = -3.14e100  # log-space "impossible" (the published sentinel)
_PREV = {  # BMES transition structure: which states may precede each state
    "B": ("E", "S"),
    "M": ("M", "B"),
    "S": ("S", "E"),
    "E": ("B", "M"),
}


class DagHmmSegmenter:
    """Deterministic jieba-algorithm segmenter over a closed dictionary.

    ``words`` maps word -> frequency (a plain iterable gets frequency 1:
    uniform frequencies make the max-prob route the minimum-word-count
    segmentation, ties to the longest first word — a well-defined
    objective that equals jieba's on dictionary-unambiguous text).
    """

    def __init__(self, words):
        if not isinstance(words, dict):
            words = {w: 1 for w in words}
        self.freq: dict[str, int] = {}
        self.total = 0
        for w, f in words.items():
            if not w:
                continue
            f = int(f)
            self.freq[w] = self.freq.get(w, 0) + f
            self.total += f
            # proper prefixes get a 0 marker so get_dag can stop extending
            # a candidate the moment it stops being a prefix of any word
            for i in range(1, len(w)):
                self.freq.setdefault(w[:i], 0)
        self.logtotal = math.log(self.total or 1)
        self._train_hmm(words)

    # -- HMM parameter estimation (MLE over the dictionary as corpus) ------
    def _train_hmm(self, words: dict[str, int]) -> None:
        start = {"B": 0, "S": 0}
        trans: dict[str, dict[str, int]] = {s: {} for s in "BMES"}
        emit: dict[str, dict[str, int]] = {s: {} for s in "BMES"}

        def labels(w: str) -> str:
            return "S" if len(w) == 1 else "B" + "M" * (len(w) - 2) + "E"

        for w, f in words.items():
            if not w:
                continue
            f = int(f)
            lab = labels(w)
            start[lab[0]] += f
            for ch, s in zip(w, lab):
                emit[s][ch] = emit[s].get(ch, 0) + f
            for a, b in zip(lab, lab[1:]):
                trans[a][b] = trans[a].get(b, 0) + f
            # word boundary: final state (E/S) hands off to the start
            # distribution — the standard closed-vocabulary estimate for
            # the cross-word transition the dictionary can't witness
            for nxt, sf in (("B", 1), ("S", 1)):
                trans[lab[-1]][nxt] = trans[lab[-1]].get(nxt, 0) + sf

        tot_start = sum(start.values()) or 1
        self.start_p = {
            s: (math.log(start.get(s, 0) / tot_start) if start.get(s) else _MIN_FLOAT)
            for s in "BMES"
        }
        self.trans_p = {}
        for s in "BMES":
            tot = sum(trans[s].values())
            self.trans_p[s] = {
                t: (math.log(trans[s][t] / tot) if trans[s].get(t) else _MIN_FLOAT)
                for t in "BMES"
            } if tot else {t: _MIN_FLOAT for t in "BMES"}
        self.emit_p = {}
        for s in "BMES":
            tot = sum(emit[s].values())
            # one-count smoothing floor so unseen chars decode instead of
            # flatlining every path at the sentinel
            floor = math.log(1.0 / (2 * (tot + 1))) if tot else math.log(0.5)
            self.emit_p[s] = (
                {c: math.log(n / (tot + 1)) for c, n in emit[s].items()},
                floor,
            )

    # -- DAG + route (jieba get_DAG / calc) --------------------------------
    def get_dag(self, s: str) -> dict[int, list[int]]:
        dag: dict[int, list[int]] = {}
        n = len(s)
        for k in range(n):
            ends = []
            i = k
            frag = s[k]
            while i < n and frag in self.freq:
                if self.freq[frag]:
                    ends.append(i)
                i += 1
                frag = s[k : i + 1]
            if not ends:
                ends.append(k)
            dag[k] = ends
        return dag

    def _route(self, s: str, dag: dict[int, list[int]]) -> dict[int, tuple]:
        n = len(s)
        route: dict[int, tuple] = {n: (0.0, 0)}
        for i in range(n - 1, -1, -1):
            route[i] = max(
                (
                    math.log(self.freq.get(s[i : x + 1]) or 1)
                    - self.logtotal
                    + route[x + 1][0],
                    x,
                )
                for x in dag[i]
            )
        return route

    # -- finalseg: BMES Viterbi over an unmatched buffer -------------------
    def _viterbi(self, obs: str) -> list[str]:
        V = [{}]
        path = {}
        for s in "BMES":
            em, floor = self.emit_p[s]
            V[0][s] = self.start_p[s] + em.get(obs[0], floor)
            path[s] = [s]
        for t in range(1, len(obs)):
            V.append({})
            newpath = {}
            for s in "BMES":
                em, floor = self.emit_p[s]
                e = em.get(obs[t], floor)
                prob, prev = max(
                    (V[t - 1][p] + self.trans_p[p].get(s, _MIN_FLOAT) + e, p)
                    for p in _PREV[s]
                )
                V[t][s] = prob
                newpath[s] = path[prev] + [s]
            path = newpath
        _, last = max((V[len(obs) - 1][s], s) for s in "ES")
        return path[last]

    def _hmm_cut_block(self, block: str):
        states = self._viterbi(block)
        begin = 0
        for i, (ch, st) in enumerate(zip(block, states)):
            if st == "B":
                begin = i
            elif st == "E":
                yield block[begin : i + 1]
            elif st == "S":
                yield ch

    def _hmm_cut(self, buf: str):
        # finalseg.cut splits the buffer into han runs (Viterbi) and
        # non-han runs (numbers / latin yielded whole)
        for blk in _HAN_ONLY.split(buf):
            if not blk:
                continue
            if _HAN_ONLY.match(blk):
                yield from self._hmm_cut_block(blk)
            else:
                for x in _NUM_ENG.split(blk):
                    if x:
                        yield x

    # -- the jieba __cut_DAG control flow ----------------------------------
    def _cut_block(self, s: str, hmm: bool):
        dag = self.get_dag(s)
        route = self._route(s, dag)
        x, n = 0, len(s)
        buf = ""
        while x < n:
            y = route[x][1] + 1
            piece = s[x:y]
            if y - x == 1:
                # singles (han OR latin) accumulate; the flush routes latin
                # runs out whole via the finalseg number/word regex
                buf += piece
            else:
                if buf:
                    yield from self._flush(buf, hmm)
                    buf = ""
                yield piece
            x = y
        if buf:
            yield from self._flush(buf, hmm)

    def _flush(self, buf: str, hmm: bool):
        if len(buf) == 1:
            yield buf
        elif self.freq.get(buf):
            # a buffered run that IS a dictionary word (possible when the
            # route preferred sub-words of equal probability) emits per
            # char, mirroring the published flow
            yield from buf
        elif not hmm:
            yield from buf
        else:
            yield from self._hmm_cut(buf)

    def cut(self, text: str, hmm: bool = True) -> list[str]:
        """Segment ``text``; latin tokens lowercase (matching the engine's
        FMM path so the two modes share downstream stopword/top-k logic)."""
        out: list[str] = []
        for blk in _HAN_BLOCK.split(text):
            if not blk:
                continue
            if _HAN_BLOCK.fullmatch(blk):
                for t in self._cut_block(blk, hmm):
                    out.append(t.lower() if t[:1].isascii() else t)
            else:
                for x in _SKIP.split(blk):
                    if x and not _SKIP.fullmatch(x) and not x.isspace():
                        out.extend(x)  # char-wise, like the published flow
        return out
