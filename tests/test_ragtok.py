"""Dictionary-trie tokenizer tests (ragflow_ray/text/ragtok.py vs
rag/nlp/rag_tokenizer.py semantics) + the Porter stemmer."""

from __future__ import annotations

import pytest

from ragflow_ray.text.porter import porter_stem
from ragflow_ray.text.ragtok import RagTok, is_chinese


class TestPorter:
    # vectors straight from the 1980 paper, one per rule family
    @pytest.mark.parametrize("word,expect", [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
        ("plastered", "plaster"), ("motoring", "motor"), ("sing", "sing"),
        ("conflated", "conflat"), ("sized", "size"), ("hopping", "hop"),
        ("tanned", "tan"), ("filing", "file"), ("happy", "happi"),
        ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
        ("rational", "ration"), ("digitizer", "digit"),
        ("conformabli", "conform"), ("vietnamization", "vietnam"),
        ("operator", "oper"), ("feudalism", "feudal"),
        ("decisiveness", "decis"), ("sensibiliti", "sensibl"),
        ("triplicate", "triplic"), ("formative", "form"),
        ("electriciti", "electr"), ("hopeful", "hope"),
        ("goodness", "good"), ("revival", "reviv"), ("inference", "infer"),
        ("airliner", "airlin"), ("adjustable", "adjust"),
        ("defensible", "defens"), ("replacement", "replac"),
        ("adoption", "adopt"), ("communism", "commun"),
        ("activate", "activ"), ("effective", "effect"),
        ("bowdlerize", "bowdler"), ("probate", "probat"), ("rate", "rate"),
        ("cease", "ceas"), ("controll", "control"), ("roll", "roll"),
    ])
    def test_paper_vectors(self, word, expect):
        assert porter_stem(word) == expect

    def test_short_words_untouched(self):
        assert porter_stem("is") == "is"
        assert porter_stem("a") == "a"


DICT = [
    "南京 2000000 ns", "市长 800000 n", "长江 900000 ns", "大桥 700000 n",
    "南京市 1500000 ns", "江大桥 20000 nr", "多校 100000 n", "划片 100000 n",
]


class TestRagTok:
    def test_classic_ambiguity(self):
        """南京市长江大桥: forward (南京市|长江|大桥) vs backward
        (南京|市长|江大桥) — the scored DFS resolves the span the same
        way the reference does (rag_tokenizer.py:345-388)."""
        t = RagTok(DICT)
        assert t.tokenize("南京市长江大桥") == "南京市 长江 大桥"

    def test_plain_dict_words(self):
        t = RagTok(DICT)
        assert t.tokenize("多校划片") == "多校 划片"

    def test_empty_dict_per_char(self):
        """No dictionary → CJK per-character tokens, latin stemmed
        (exactly the reference with an empty trie)."""
        assert RagTok().tokenize("南京 worlds") == "南 京 world"

    def test_english_stem_and_lemma(self):
        t = RagTok()
        assert t.tokenize("The Mice Are Running") == "the mous ar run"

    def test_mixed_latin_cjk(self):
        t = RagTok(DICT)
        out = t.tokenize("Unity3D南京市")
        assert out == "unity3d 南京市"

    def test_freq_tag_roundtrip(self):
        t = RagTok(DICT)
        # F = int(ln(2)+0.5) = 1 -> freq = int(e^1 * 1e6 + 0.5)
        assert t.freq("南京") == 2718282
        assert t.tag("江大桥") == "nr"
        assert t.freq("不存在") == 0 and t.tag("不存在") == ""

    def test_user_dict_add_vs_load(self):
        t = RagTok(DICT)
        t.add_user_dict(["哈哈 500000 e"])
        assert t.tag("哈哈") == "e"
        assert t.tag("南京") == "ns"  # add merges
        t.load_user_dict(["哈哈 500000 e"])
        assert t.tag("南京") == ""  # load replaces

    def test_dup_entry_keeps_higher_freq(self):
        t = RagTok(["词 1000000 a", "词 8000000 b"])
        assert t.tag("词") == "b"

    def test_q2b_and_lower_normalization(self):
        t = RagTok(["ｗｏｒｄｓ 1000000 n"])  # full-width in the dict line
        # full-width input + uppercase both collapse onto the same key
        assert t.tokenize("ＷＯＲＤＳ") == "word"  # latin path: stemmed

    def test_repetition_run_collapse(self):
        """>=5 identical chars become one (<=10-char) token via the
        DFS shortcut (rag_tokenizer.py:140-162)."""
        t = RagTok(DICT)
        out = t.fine_grained_tokenize(t.tokenize("哈" * 8))
        assert "哈哈哈" in out.replace(" ", "")

    def test_fine_grained_second_best(self):
        t = RagTok(DICT)
        assert t.fine_grained_tokenize("南京市") == "南京 市"

    def test_fine_grained_mostly_latin_slash_split(self):
        t = RagTok()
        assert t.fine_grained_tokenize("sql python a/b") == "sql python a b"

    def test_merge_rejoins_dict_word_with_splitchar(self):
        t = RagTok(["c++ 1000000 n"])
        assert t._merge("c ++") == "c++"

    def test_number_runs_kept_whole(self):
        t = RagTok(DICT)
        assert t.tokenize("南京2024") == "南京 2024"


class TestDriverQueryConstants:
    def test_alpha_stable_under_normalization(self):
        from ragflow_ray.ops.tokenize import CJK_ALPHA
        from ragflow_ray.text.normalize import str_q2b, tradi2simp

        assert len(CJK_ALPHA) == 26
        assert tradi2simp(CJK_ALPHA) == CJK_ALPHA
        assert str_q2b(CJK_ALPHA) == CJK_ALPHA
        assert all(is_chinese(c) for c in CJK_ALPHA)

    def test_fine_constants_stable_and_pinned(self):
        """Fine-grained plant: the terminator and plant chars survive
        normalization; the planted token's second-best DFS tiling is
        the oracle constant; terminator-suffixed word images are
        fine-grained-invariant (unique tiling)."""
        from ragflow_ray.ops.tokenize import (
            CJK_ALPHA, FINE_DICT, FINE_RESOLVED, FINE_SPAN, FINE_TERM,
        )
        from ragflow_ray.text.normalize import str_q2b, tradi2simp

        extra = FINE_SPAN + FINE_TERM
        assert tradi2simp(extra) == extra and str_q2b(extra) == extra
        assert all(is_chinese(c) for c in extra)
        assert not any(c in CJK_ALPHA for c in extra)

        words = ["the", "theme", "them", "sustainable", "a"]
        images = [
            w.translate(str.maketrans(
                "abcdefghijklmnopqrstuvwxyz", CJK_ALPHA)) + FINE_TERM
            for w in words
        ]
        t = RagTok([f"{img} 1000000 n" for img in images] + FINE_DICT)
        line = " ".join(images) + " " + FINE_SPAN
        toks = t.tokenize(line)
        assert toks == line  # word-boundary segmentation exact
        fine = t.fine_grained_tokenize(toks)
        # corpus images unchanged (prefix-free => unique tiling);
        # plant resolved to the constant second-best split
        assert fine == " ".join(images) + " " + FINE_RESOLVED

    def test_ambiguity_resolution_pinned(self):
        """The planted span resolves to the score-winning tiling: the
        oracle's constant suffix is the DFS output, not an accident."""
        from ragflow_ray.ops.tokenize import (
            AMBIG_DICT, AMBIG_RESOLVED, AMBIG_SPAN,
        )

        t = RagTok(AMBIG_DICT)
        assert t.tokenize(AMBIG_SPAN) == AMBIG_RESOLVED
        # and it IS a disagreement case: FW and BW differ
        fw, _ = t._max_forward(AMBIG_SPAN)
        bw, _ = t._max_backward(AMBIG_SPAN)
        assert fw != bw


class TestBlockTypeNr:
    def test_nr_with_tokenizer(self):
        from ragflow_ray.pdf.tables import cell_block_type

        t = RagTok(DICT)
        box = {"text": "江大桥"}
        assert cell_block_type(box) == "Ot"  # tokenless fallback
        assert cell_block_type(box, tok=t) == "Nr"

    def test_tx_unchanged_with_tokenizer(self):
        from ragflow_ray.pdf.tables import cell_block_type

        t = RagTok(DICT)
        box = {"text": "南京市 长江 大桥 多校 划片"}
        assert cell_block_type(box, tok=t) == "Tx"
