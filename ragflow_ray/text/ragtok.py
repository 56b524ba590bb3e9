"""Dictionary-trie tokenizer — the reference's ``RagTokenizer``
(rag/nlp/rag_tokenizer.py:31-432) re-expressed from scratch.

The reference builds a datrie over a frequency dictionary
(``huqie.txt``, downloaded at deploy time — NOT shipped in the repo)
and segments mixed Chinese/latin text by bidirectional maximum
matching: forward and backward greedy matches are compared span by
span, and every disagreeing span is re-segmented by a scored DFS over
all dictionary tilings (score = 30/n_tokens + long-token ratio + sum
of log-frequencies, rag_tokenizer.py:212-222).  Latin tokens are
lemmatized + Porter-stemmed.

This implementation keeps those semantics with stdlib-only parts:

* trie → plain dict + prefix set (``datrie`` is unavailable; the
  reference's ``str(encode())[2:-1]`` key mangling exists only to fit
  datrie's printable alphabet, so keys here are the lowercased words
  themselves — observably equivalent);
* reverse keys (``DD`` + reversed word, rag_tokenizer.py:35-36) → a
  second prefix set over reversed words, used by backward matching's
  is-suffix-of-some-word probe;
* nltk stem/lemmatize/word_tokenize → from-scratch Porter
  (:mod:`.porter`), a small irregular-noun table, and whitespace
  splitting (exact equivalences and divergences: DIVERGENCES.md §6e);
* the dictionary itself is a USER INPUT — ``RagTok(dict_lines)`` /
  ``add_user_dict`` mirror ``loadUserDict``/``addUserDict``
  (rag_tokenizer.py:90-99).  With no dictionary, CJK text degrades to
  per-character tokens, exactly like the reference with an empty trie.

Dict line format (the reference's): ``word<space|tab>freq<space>tag``.
"""

from __future__ import annotations

import math
import re

from .normalize import str_q2b, tradi2simp
from .porter import porter_stem

DENOMINATOR = 1_000_000

# rag_tokenizer.py:69 — the split alphabet: punctuation runs OR latin
# alnum runs become their own segments
SPLIT_CHAR = (
    r"([ ,\.<>/?;:'\[\]\\`!@#$%^&*\(\)\{\}\|_+=《》，。？、；‘’：“”【】~！￥%……（）——-]+"
    r"|[a-zA-Z0-9,\.-]+)"
)
_SPLIT_RE = re.compile(SPLIT_CHAR)
_NONWORD = re.compile(r"\W+")
_LATIN_RUN = re.compile(r"[a-z\.-]+$")
_NUM_RUN = re.compile(r"[0-9\.-]+$")
_FINE_NUM = re.compile(r"[0-9,\.-]+$")
_EN_TOKEN = re.compile(r"[a-zA-Z_-]+$")

# WordNet's irregular noun exceptions that lemmatize() would catch and
# the Porter stemmer cannot (tiny documented subset — WordNet data is
# not available offline, DIVERGENCES.md §6e)
_IRREGULAR_NOUNS = {
    "mice": "mouse", "feet": "foot", "geese": "goose", "teeth": "tooth",
    "children": "child", "men": "man", "women": "woman", "lives": "life",
    "wives": "wife", "knives": "knife", "leaves": "leaf", "selves": "self",
    "oxen": "ox", "indices": "index", "matrices": "matrix", "data": "datum",
}


def _lemma(word: str) -> str:
    return _IRREGULAR_NOUNS.get(word, word)


def _norm_en(word: str) -> str:
    return porter_stem(_lemma(word))


def is_chinese(ch: str) -> bool:
    return "一" <= ch <= "龥"


class RagTok:
    """Trie tokenizer with user-dictionary loading.

    ``dict_lines``: iterable of ``word freq tag`` lines (the
    reference's huqie format).  All probes are lowercased, matching
    the reference's ``key_`` (rag_tokenizer.py:32-33).
    """

    def __init__(self, dict_lines=None):
        self._words: dict[str, tuple[int, str]] = {}
        self._prefixes: set[str] = set()
        self._rprefixes: set[str] = set()
        if dict_lines is not None:
            self.add_user_dict(dict_lines)

    # -- dictionary ---------------------------------------------------

    def add_user_dict(self, lines) -> None:
        """``addUserDict`` (rag_tokenizer.py:98): merge entries, keeping
        the higher log-frequency on duplicates."""
        for raw in lines:
            raw = re.sub(r"[\r\n]+", "", raw)
            if not raw.strip():
                continue
            parts = re.split(r"[ \t]", raw)
            word = parts[0].lower()
            f = int(math.log(float(parts[1]) / DENOMINATOR) + 0.5)
            tag = parts[2] if len(parts) > 2 else ""
            if word not in self._words or self._words[word][0] < f:
                self._words[word] = (f, tag)
            for i in range(1, len(word) + 1):
                self._prefixes.add(word[:i])
            rev = word[::-1]
            for i in range(1, len(rev) + 1):
                self._rprefixes.add(rev[:i])

    def load_user_dict(self, lines) -> None:
        """``loadUserDict`` (rag_tokenizer.py:90): replace the trie."""
        self._words.clear()
        self._prefixes.clear()
        self._rprefixes.clear()
        self.add_user_dict(lines)

    def _has_prefix(self, t: str) -> bool:
        return t.lower() in self._prefixes

    def _has_rprefix(self, t: str) -> bool:
        """Is ``t`` a suffix of some dictionary word?  (The reference's
        has_keys_with_prefix over 'DD'+reversed keys.)"""
        return t.lower()[::-1] in self._rprefixes

    def _get(self, t: str):
        return self._words.get(t.lower())

    def freq(self, tk: str) -> int:
        e = self._get(tk)
        if e is None:
            return 0
        return int(math.exp(e[0]) * DENOMINATOR + 0.5)

    def tag(self, tk: str) -> str:
        e = self._get(tk)
        return "" if e is None else e[1]

    # -- scoring ------------------------------------------------------

    def _score(self, tfts):
        """rag_tokenizer.py:212-222: 30/n + long-token ratio + sum of
        stored log-freqs (missing tokens carry 0 or -12)."""
        B = 30
        F, L, tks = 0, 0, []
        for tk, (f, _tag) in tfts:
            F += f
            L += 0 if len(tk) < 2 else 1
            tks.append(tk)
        L /= len(tks)
        return tks, B / len(tks) + L + F

    def _sort_tks(self, tkslist):
        res = [self._score(tfts) for tfts in tkslist]
        return sorted(res, key=lambda x: x[1], reverse=True)

    # -- matching -----------------------------------------------------

    def _max_forward(self, line: str):
        """Greedy longest-prefix-match left to right
        (rag_tokenizer.py:249-271)."""
        res = []
        s = 0
        while s < len(line):
            e = s + 1
            t = line[s:e]
            while e < len(line) and self._has_prefix(t):
                e += 1
                t = line[s:e]
            while e - 1 > s and self._get(t) is None:
                e -= 1
                t = line[s:e]
            entry = self._get(t)
            res.append((t, entry if entry is not None else (0, "")))
            s = e
        return self._score(res)

    def _max_backward(self, line: str):
        """Greedy longest-suffix-match right to left
        (rag_tokenizer.py:273-294)."""
        res = []
        s = len(line) - 1
        while s >= 0:
            e = s + 1
            t = line[s:e]
            while s > 0 and self._has_rprefix(t):
                s -= 1
                t = line[s:e]
            while s + 1 < e and self._get(t) is None:
                s += 1
                t = line[s:e]
            entry = self._get(t)
            res.append((t, entry if entry is not None else (0, "")))
            s -= 1
        return self._score(res[::-1])

    def _dfs(self, chars: str, s: int, pre_tks, tkslist, depth=0, memo=None):
        """All dictionary tilings of ``chars[s:]`` appended to
        ``tkslist`` (rag_tokenizer.py:119-198), with the reference's
        depth cap, repetition shortcut and memoized furthest-reach."""
        if memo is None:
            memo = {}
        if depth > 10:
            if s < len(chars):
                tkslist.append(pre_tks + [("".join(chars[s:]), (-12, ""))])
            return s

        state = (s, tuple(tk[0] for tk in pre_tks)) if pre_tks else (s, None)
        if state in memo:
            return memo[state]

        res = s
        if s >= len(chars):
            tkslist.append(pre_tks)
            memo[state] = s
            return s

        # runs of >=5 identical chars collapse to one (<=10-char) token
        if s < len(chars) - 4 and all(
            chars[s + i] == chars[s] for i in range(1, 5)
        ):
            end = s
            while end < len(chars) and chars[end] == chars[s]:
                end += 1
            mid = s + min(10, end - s)
            t = chars[s:mid]
            entry = self._get(t)
            nxt = self._dfs(
                chars, mid,
                pre_tks + [(t, entry if entry is not None else (-12, ""))],
                tkslist, depth + 1, memo,
            )
            res = max(res, nxt)
            memo[state] = res
            return res

        S = s + 1
        if s + 2 <= len(chars):
            t1, t2 = chars[s:s + 1], chars[s:s + 2]
            if self._has_prefix(t1) and not self._has_prefix(t2):
                S = s + 2
        if (
            len(pre_tks) > 2
            and len(pre_tks[-1][0]) == 1
            and len(pre_tks[-2][0]) == 1
            and len(pre_tks[-3][0]) == 1
        ):
            t1 = pre_tks[-1][0] + chars[s:s + 1]
            if self._has_prefix(t1):
                S = s + 2

        for e in range(S, len(chars) + 1):
            t = chars[s:e]
            if e > s + 1 and not self._has_prefix(t):
                break
            entry = self._get(t)
            if entry is not None:
                res = max(res, self._dfs(
                    chars, e, pre_tks + [(t, entry)],
                    tkslist, depth + 1, memo,
                ))

        if res > s:
            memo[state] = res
            return res

        t = chars[s:s + 1]
        entry = self._get(t)
        result = self._dfs(
            chars, s + 1,
            pre_tks + [(t, entry if entry is not None else (-12, ""))],
            tkslist, depth + 1, memo,
        )
        memo[state] = result
        return result

    # -- assembly -----------------------------------------------------

    def _merge(self, tks: str) -> str:
        """Re-join adjacent tokens whose concatenation carries a split
        char yet is itself a dictionary word (rag_tokenizer.py:231-247)."""
        res = []
        tokens = re.sub(r"[ ]+", " ", tks).split()
        s = 0
        while s < len(tokens):
            E = s + 1
            for e in range(s + 2, min(len(tokens) + 2, s + 6)):
                tk = "".join(tokens[s:e])
                if _SPLIT_RE.search(tk) and self.freq(tk):
                    E = e
            res.append("".join(tokens[s:E]))
            s = E
        return " ".join(res)

    def _split_by_lang(self, line: str):
        """Alternating (segment, is_chinese) pairs
        (rag_tokenizer.py:299-320)."""
        pairs = []
        for a in _SPLIT_RE.split(line):
            if not a:
                continue
            s = 0
            e = s + 1
            zh = is_chinese(a[s])
            while e < len(a):
                _zh = is_chinese(a[e])
                if _zh == zh:
                    e += 1
                    continue
                pairs.append((a[s:e], zh))
                s = e
                e = s + 1
                zh = _zh
            if s >= len(a):
                continue
            pairs.append((a[s:e], zh))
        return pairs

    def tokenize(self, line: str) -> str:
        """rag_tokenizer.py:322-392: normalize, split by language,
        stem latin runs, bidirectional-match Chinese runs and DFS-score
        every disagreeing span."""
        line = _NONWORD.sub(" ", line)
        line = str_q2b(line).lower()
        line = tradi2simp(line)

        res = []
        for L, zh in self._split_by_lang(line):
            if not zh:
                res.extend(_norm_en(t) for t in L.split())
                continue
            if len(L) < 2 or _LATIN_RUN.match(L) or _NUM_RUN.match(L):
                res.append(L)
                continue

            tks, _s = self._max_forward(L)
            tks1, _s1 = self._max_backward(L)

            i, j, _i, _j = 0, 0, 0, 0
            same = 0
            while (
                i + same < len(tks1) and j + same < len(tks)
                and tks1[i + same] == tks[j + same]
            ):
                same += 1
            if same > 0:
                res.append(" ".join(tks[j:j + same]))
            _i = i + same
            _j = j + same
            j = _j + 1
            i = _i + 1

            while i < len(tks1) and j < len(tks):
                tk1, tk = "".join(tks1[_i:i]), "".join(tks[_j:j])
                if tk1 != tk:
                    if len(tk1) > len(tk):
                        j += 1
                    else:
                        i += 1
                    continue
                if tks1[i] != tks[j]:
                    i += 1
                    j += 1
                    continue
                tkslist = []
                self._dfs("".join(tks[_j:j]), 0, [], tkslist)
                res.append(" ".join(self._sort_tks(tkslist)[0][0]))

                same = 1
                while (
                    i + same < len(tks1) and j + same < len(tks)
                    and tks1[i + same] == tks[j + same]
                ):
                    same += 1
                res.append(" ".join(tks[j:j + same]))
                _i = i + same
                _j = j + same
                j = _j + 1
                i = _i + 1

            if _i < len(tks1):
                tkslist = []
                self._dfs("".join(tks[_j:]), 0, [], tkslist)
                res.append(" ".join(self._sort_tks(tkslist)[0][0]))

        return self._merge(" ".join(res))

    def fine_grained_tokenize(self, tks: str) -> str:
        """rag_tokenizer.py:394-432: second-best DFS split of long
        tokens (sub-word recall for retrieval fields)."""
        tokens = tks.split()
        zh_num = sum(1 for c in tokens if c and is_chinese(c[0]))
        if zh_num < len(tokens) * 0.2:
            res = []
            for tk in tokens:
                res.extend(tk.split("/"))
            return " ".join(res)

        res = []
        for tk in tokens:
            if len(tk) < 3 or _FINE_NUM.match(tk):
                res.append(tk)
                continue
            tkslist = []
            if len(tk) > 10:
                tkslist.append(tk)
            else:
                self._dfs(tk, 0, [], tkslist)
            if len(tkslist) < 2:
                res.append(tk)
                continue
            stk = self._sort_tks(tkslist)[1][0]
            if len(stk) == len(tk):
                stk = tk
            else:
                if _LATIN_RUN.match(tk):
                    for t in stk:
                        if len(t) < 3:
                            stk = tk
                            break
                    else:
                        stk = " ".join(stk)
                else:
                    stk = " ".join(stk)
            res.append(stk)

        return " ".join(
            _norm_en(t) if _EN_TOKEN.match(t) else t for t in res
        )
