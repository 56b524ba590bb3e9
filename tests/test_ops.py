"""Behavior tests for the corpus-scale data ops: planted duplicates
must be found by each dedup strategy; ANN exactness; multimodal stubs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """A tiny documents/embeddings testdata dir with planted dups."""
    d = tmp_path_factory.mktemp("planted")
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [
        base,                                   # 0
        base,                                   # 1: exact dup of 0
        "dog lazy the over jumps fox brown quick the again and again",  # 2: permuted
        base + " with a tiny trailing change",  # 3: near-dup of 0
        "completely different content about ray data pipelines at scale",  # 4
        "another unrelated document mentioning lance tables and arrow",   # 5
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))

    rs = np.random.RandomState(7)
    vecs = rs.randn(20, 16).astype(np.float32)
    vecs[1] = vecs[0] + rs.randn(16).astype(np.float32) * 0.01  # near-dup pair
    emb = pa.table(
        {
            "vec_id": pa.array(range(20), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 20, type=pa.int32()),
        }
    )
    pq.write_table(emb, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup_groups_identical(self, planted_dir):
        from ragflow_ray.ops.dedup import exact_dedup

        df = exact_dedup(planted_dir)
        dup = df[df["n_copies"] > 1]
        assert len(dup) == 1
        assert dup.iloc[0]["keeper_doc_id"] == 0
        assert dup.iloc[0]["n_copies"] == 2

    def test_token_set_dedup_catches_permutation(self, planted_dir):
        from ragflow_ray.ops.dedup import token_set_dedup

        df = token_set_dedup(planted_dir)
        grp = df[df["n_members"] >= 3]
        assert len(grp) == 1 and grp.iloc[0]["keeper_doc_id"] == 0

    def test_minhash_finds_near_dup(self, planted_dir):
        from ragflow_ray.ops.dedup import minhash_near_dups

        pairs = minhash_near_dups(planted_dir).to_pandas()
        found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
        assert (0, 1) in found  # exact dup survives LSH + verify
        assert all(4 not in p and 5 not in p for p in found)

    def test_simhash_near_dups(self, planted_dir):
        from ragflow_ray.ops.dedup import simhash_near_dups, simhash_signatures

        sigs = simhash_signatures(planted_dir).to_pandas()
        assert sigs.loc[sigs.doc_id == 0, "simhash"].iloc[0] == \
               sigs.loc[sigs.doc_id == 1, "simhash"].iloc[0]
        pairs = simhash_near_dups(planted_dir).to_pandas()
        found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
        assert (0, 1) in found

    def test_embedding_near_dup_pair(self, planted_dir):
        from ragflow_ray.ops.dedup import embedding_near_dups

        pairs = embedding_near_dups(planted_dir, threshold=0.95)
        found = set(map(tuple, pairs[["vec_a", "vec_b"]].values))
        assert (0, 1) in found

    def test_hash_dedup_branches_agree(self):
        """driver_merge_limit=0 forces the hash-partitioned groupby
        exchange; the default gates into the driver merge — identical
        frames either way for all three hash-keyed dedup ops."""
        import pandas as pd

        from ragflow_ray.ops.dedup import (
            dedup_keepers, exact_dedup, token_set_dedup)

        sf = "/root/testdata/sf0.001"
        for fn in (exact_dedup, dedup_keepers, token_set_dedup):
            pd.testing.assert_frame_equal(fn(sf), fn(sf, driver_merge_limit=0))

    def test_textstat_gate_branches_agree(self):
        """driver_limit=0 forces the exact distributed recount paths
        (zipf top-k partials, ttr additive stats partials, novelty
        doc-keyed groupby); default gates finalize on the driver —
        identical frames either way."""
        import pandas as pd

        from ragflow_ray.ops.textstats import (ngram_novelty, ttr_by_source,
                                               zipf_fit)

        sf = "/root/testdata/sf0.001"
        for fn in (zipf_fit, ttr_by_source, ngram_novelty):
            pd.testing.assert_frame_equal(fn(sf), fn(sf, driver_limit=0))

        from ragflow_ray.ops.dedup import source_dup_rate

        pd.testing.assert_frame_equal(
            source_dup_rate(sf), source_dup_rate(sf, driver_limit=0))

    def test_join_shape_branches_agree(self):
        """broadcast_limit=0 forces the union + coarse-bucket
        co-partition fallbacks of the semi-join and anti-join ops;
        the default gates into the broadcast paths — identical
        frames either way."""
        import pandas as pd

        from ragflow_ray.ops.relational import (inactive_customers,
                                                late_order_priority)

        sf = "/root/testdata/sf0.001"
        for fn in (late_order_priority, inactive_customers):
            pd.testing.assert_frame_equal(fn(sf), fn(sf, broadcast_limit=0))

    def test_shipping_priority_branches_agree(self):
        """broadcast_limit=0 forces the union + coarse orderkey-bucket
        co-partition fallback of the Q3-shaped top-k; the default
        gates into the broadcast-orderkeys path — identical frames
        either way, at both bucket widths."""
        import pandas as pd

        from ragflow_ray.ops.relational import shipping_priority

        sf = "/root/testdata/sf0.001"
        base = shipping_priority(sf)
        pd.testing.assert_frame_equal(
            base, shipping_priority(sf, broadcast_limit=0))
        pd.testing.assert_frame_equal(
            base, shipping_priority(sf, broadcast_limit=0, n_buckets=7))

    def test_late_events_planted_out_of_order(self, tmp_path):
        """The sf corpora are ingest-ordered (late_frac 0 everywhere),
        so plant a shuffled stream and pin nonzero late counts against
        a DuckDB window recomputation, on both the driver fast path
        and the distributed prefix-max path at an odd bucket width."""
        import duckdb
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ragflow_ray.ops.relational import late_events

        rng = np.random.RandomState(7)
        n = 5000
        ts = (np.int64(1_600_000_000_000_000)
              + rng.permutation(n).astype("int64") * 1_000_000)
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.randint(0, 50, n).astype("int64"),
            "event_type": np.where(rng.rand(n) < 0.5, "view", "click"),
            "value": np.zeros(n),
            "props": ["{}"] * n,
        })
        pq.write_table(pa.Table.from_pandas(df),
                       str(tmp_path / "events.parquet"))

        want = duckdb.sql(f"""
            WITH x AS (
                SELECT event_type, ts,
                       MAX(ts) OVER (PARTITION BY event_type
                                     ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS pm
                FROM read_parquet('{tmp_path}/events.parquet'))
            SELECT event_type, COUNT(*)::BIGINT AS n_events,
                   SUM(CASE WHEN pm IS NOT NULL AND ts < pm
                            THEN 1 ELSE 0 END)::BIGINT AS n_late,
                   round(SUM(CASE WHEN pm IS NOT NULL AND ts < pm
                                  THEN 1 ELSE 0 END)::DOUBLE
                         / COUNT(*), 6) AS late_frac
            FROM x GROUP BY 1 ORDER BY 1
        """).df()
        assert (want["n_late"] > 0).all()  # the plant actually plants

        got = late_events(str(tmp_path))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        dist = late_events(str(tmp_path), broadcast_limit=0, bucket=97)
        pd.testing.assert_frame_equal(dist, want, check_dtype=False)

    def test_source_js_divergence_branches_agree(self):
        """driver_limit=0 forces the word-bucket co-partition with
        pairs-sized per-bucket partial sums; the default finalizes the
        dense sources × vocab matrix on the driver — identical round-6
        frames either way, at both bucket widths."""
        import pandas as pd

        from ragflow_ray.ops.textstats import source_js_divergence

        sf = "/root/testdata/sf0.001"
        base = source_js_divergence(sf)
        pd.testing.assert_frame_equal(
            base, source_js_divergence(sf, driver_limit=0))
        pd.testing.assert_frame_equal(
            base, source_js_divergence(sf, driver_limit=0, n_buckets=7))

    def test_q8_q10_q15_branches_agree(self):
        """broadcast_limit=0 forces the union + orderkey co-partition
        fallbacks of the Q8-shaped market share and the Q10-shaped
        returned-item report; driver_limit=0 forces the distributed
        Sum fold of the Q15-shaped top supplier — identical frames
        either way."""
        import pandas as pd

        from ragflow_ray.ops.relational import (market_share,
                                                returned_item_revenue,
                                                top_supplier)

        sf = "/root/testdata/sf0.001"
        for fn in (market_share, returned_item_revenue):
            pd.testing.assert_frame_equal(fn(sf), fn(sf, broadcast_limit=0))
        pd.testing.assert_frame_equal(
            top_supplier(sf), top_supplier(sf, driver_limit=0))

        from ragflow_ray.ops.relational import customer_rfm

        pd.testing.assert_frame_equal(
            customer_rfm(sf), customer_rfm(sf, driver_limit=0))

    def test_q7_q9_q13_q18_branches_agree(self):
        """broadcast_limit=0 forces the shared _attach_order_attr
        union + coarse orderkey-bucket co-partition under the
        Q7-shaped volume-shipping and Q9-shaped nation-part reports;
        driver_limit=0 forces the distributed Sum folds of the
        Q13-shaped order-count histogram and the Q18-shaped
        large-volume filter — identical frames either way."""
        import pandas as pd

        from ragflow_ray.ops.relational import (
            customer_order_distribution, large_volume_customers,
            nation_part_revenue, volume_shipping)

        sf = "/root/testdata/sf0.001"
        for fn in (volume_shipping, nation_part_revenue):
            pd.testing.assert_frame_equal(fn(sf), fn(sf, broadcast_limit=0))
        for fn in (customer_order_distribution, large_volume_customers):
            pd.testing.assert_frame_equal(fn(sf), fn(sf, driver_limit=0))

    def test_small_qty_revenue_empty_brand(self):
        """A brand no part carries yields the typed zero row (the
        SQL COALESCE shape), not a column-less frame."""
        import pandas as pd

        from ragflow_ray.ops.relational import small_qty_revenue

        out = small_qty_revenue("/root/testdata/sf0.001",
                                brand="Brand#none")
        assert list(out.columns) == ["total_price_c2", "n_items",
                                     "avg_yearly"]
        assert out["total_price_c2"].iloc[0] == 0
        assert out["n_items"].iloc[0] == 0

    def test_pmi_collocations_branches_agree(self):
        """driver_limit=0 forces the distributed recount + marginal
        reduce + broadcast scoring; the default gates into the driver
        finalize — identical ranked frames either way."""
        import pandas as pd

        from ragflow_ray.ops.textstats import pmi_collocations

        sf = "/root/testdata/sf0.001"
        pd.testing.assert_frame_equal(
            pmi_collocations(sf), pmi_collocations(sf, driver_limit=0))


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_self_is_rank_one(self, planted_dir):
        from ragflow_ray.ops.ann import brute_force_topk

        df = brute_force_topk(planted_dir, k=5, n_queries=3)
        for q in (0, 1, 2):
            top = df[(df.q_vec_id == q) & (df["rank"] == 1)]
            assert top.iloc[0]["vec_id"] == q

    def test_ivf_recall_on_top1(self, planted_dir):
        from ragflow_ray.ops.ann import brute_force_topk, ivf_topk

        exact = brute_force_topk(planted_dir, k=3, n_queries=3, )
        approx = ivf_topk(planted_dir, k=3, n_queries=3, n_lists=4, n_probe=2)
        # rank-1 of each query must be recalled by IVF (self vector)
        for q in (0, 1, 2):
            e1 = exact[(exact.q_vec_id == q) & (exact["rank"] == 1)]["vec_id"].iloc[0]
            got = set(approx[approx.q_vec_id == q]["vec_id"])
            assert e1 in got


class TestMultimodal:
    def test_decode_stub_raises_without_fake(self):
        from ragflow_ray.ops.multimodal import decode_audio, decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"payload")
        with pytest.raises(NotImplementedError):
            decode_audio(b"payload")

    def test_decode_audio_real_wav_mono(self):
        from ragflow_ray.ops.multimodal import decode_audio
        from ragflow_ray.parsers.wavdec import encode_wav_pcm16

        v = np.array([-32768, -256, 0, 256, 32512], dtype=np.int16)
        wave = decode_audio(encode_wav_pcm16(v), fake=False)
        assert wave.dtype == np.float32 and wave.shape == (5,)
        assert (np.round(wave.astype(np.float64) * 32768).astype(np.int64)
                == v.astype(np.int64)).all()

    def test_decode_audio_real_wav_stereo_downmix(self):
        from ragflow_ray.ops.multimodal import decode_audio
        from ragflow_ray.parsers.wavdec import encode_wav_pcm16

        s = np.array([[100, 300], [-200, 200]], dtype=np.int16)
        wave = decode_audio(encode_wav_pcm16(s), fake=False)
        assert wave.shape == (2,)
        got = np.round(wave.astype(np.float64) * 32768 * 2).astype(np.int64)
        assert (got == s.astype(np.int64).sum(axis=1)).all()

    def test_fake_decode_deterministic(self):
        from ragflow_ray.ops.multimodal import decode_image

        a = decode_image(b"same bytes", fake=True)
        b = decode_image(b"same bytes", fake=True)
        assert a.shape == (8, 8, 3)
        assert (a == b).all()

    @pytest.mark.usefixtures("ray_session")
    def test_feature_stage(self, planted_dir):
        from ragflow_ray.ops.multimodal import media_features

        df = media_features(planted_dir).to_pandas()
        assert len(df) == 6
        assert (df["payload_bytes"] > 7).all()
        assert df["payload_md5"].str.len().eq(32).all()


@pytest.mark.usefixtures("ray_session")
class TestDedupScale:
    """Scale-discipline tests added in round 2 (VERDICT.md tasks 1 & 5)."""

    @pytest.fixture(scope="class")
    def hot_dir(self, tmp_path_factory):
        """A corpus engineered so one simhash band bucket is hot: many
        docs share band 0 (low 16 bits) without being near-dups."""
        d = tmp_path_factory.mktemp("hot")
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "eta", "theta", "iota", "kappa"]
        rs = np.random.RandomState(3)
        texts = []
        for i in range(400):
            n = 30 + int(rs.randint(0, 20))
            texts.append(" ".join(words[j % 10] + str(rs.randint(0, 1000))
                                  for j in range(n)))
        # planted identical pair at the end (simhash hamming 0)
        texts.append("one two three four five six seven eight nine ten " * 4)
        texts.append(texts[-1])
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        )
        pq.write_table(docs, str(d / "documents.parquet"))
        return str(d)

    def test_simhash_bucket_cap_drops_logged(self, hot_dir):
        """With a tiny bucket cap the sweep stays bounded and still runs
        to completion; with the default cap the planted pair is found."""
        from ragflow_ray.ops.dedup import simhash_near_dups

        capped = simhash_near_dups(hot_dir, max_bucket_sigs=4).to_pandas()
        full = simhash_near_dups(hot_dir).to_pandas()
        planted = full[(full.doc_a == 400) & (full.doc_b == 401)]
        assert len(planted) == 1
        # the cap can only remove pairs, never invent them
        assert len(capped) <= len(full)

    def test_simhash_pairs_unique_and_match_bruteforce(self, planted_dir):
        """First-shared-band emission yields each pair exactly once and
        the pair set equals the brute-force hamming<=3 sweep."""
        from ragflow_ray.ops.dedup import simhash_near_dups, simhash_signatures

        sigs = simhash_signatures(planted_dir).to_pandas()
        sig_of = dict(zip(sigs.doc_id, sigs.simhash))
        expected = set()
        ids = sorted(sig_of)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                x = (int(sig_of[ids[i]]) ^ int(sig_of[ids[j]])) & ((1 << 64) - 1)
                if bin(x).count("1") <= 3:
                    expected.add((ids[i], ids[j]))
        pairs = simhash_near_dups(planted_dir).to_pandas()
        got = list(zip(pairs.doc_a, pairs.doc_b))
        assert len(got) == len(set(got))  # no duplicate emissions
        assert set(got) == expected

    def test_minhash_distributed_verify_larger_corpus(self, tmp_path):
        """MinHash at a few thousand docs with planted dups — exercises
        the distributed join verify (no driver-side text dict)."""
        from ragflow_ray.ops.dedup import minhash_near_dups

        rs = np.random.RandomState(11)
        vocab = [f"w{i}" for i in range(500)]
        texts = [
            " ".join(vocab[rs.randint(0, 500)] for _ in range(40))
            for _ in range(3000)
        ]
        texts[100] = texts[50]  # exact dup
        texts[200] = texts[60] + " xx"  # near dup
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        # broadcast_limit=0 forces the distributed two-join verify
        pairs = minhash_near_dups(str(tmp_path), broadcast_limit=0).to_pandas()
        found = set(zip(pairs.doc_a, pairs.doc_b))
        assert (50, 100) in found
        assert (60, 200) in found
        # the small-side (pruned-read) path must agree exactly
        small = minhash_near_dups(str(tmp_path)).to_pandas()
        assert set(zip(small.doc_a, small.doc_b)) == found

    def test_ngram_jaccard_both_paths_agree(self, planted_dir):
        """Exact n-gram Jaccard: the planted exact pair scores 10000;
        the broadcast and distributed verifies agree."""
        from ragflow_ray.ops.dedup import ngram_jaccard_dups

        small = ngram_jaccard_dups(planted_dir).to_pandas()
        assert (0, 1, 10000) in set(
            zip(small.doc_a, small.doc_b, small.jaccard_x10000)
        )
        dist = ngram_jaccard_dups(planted_dir, broadcast_limit=0).to_pandas()
        assert small.values.tolist() == dist.values.tolist()


class TestMultimodalStages:
    """Round-2 resize / frame-sample stages (kernel + plumbing)."""

    def test_resize_mean_pool_kernel(self):
        from ragflow_ray.ops.multimodal import resize_image

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        small = resize_image(img, 4, 4)
        assert small.shape == (4, 4, 3)
        # block (0,0) channel 0: pixels (0,0),(0,1),(1,0),(1,1) ch0
        expect = (img[0, 0, 0].astype(int) + img[0, 1, 0] + img[1, 0, 0]
                  + img[1, 1, 0]) // 4
        assert small[0, 0, 0] == expect

    @pytest.mark.usefixtures("ray_session")
    def test_resize_and_frame_sample_stages(self, planted_dir):
        from ragflow_ray.ops.multimodal import media_frame_sample, media_resize

        rs = media_resize(planted_dir).to_pandas()
        assert len(rs) == 6
        assert (rs["out_h"] == 4).all() and (rs["out_w"] == 4).all()
        assert rs["resized_md5"].str.len().eq(32).all()
        fs = media_frame_sample(planted_dir).to_pandas()
        assert (fs["n_frames"] == 17).all()
        assert (fs["frame_sum"] > 0).all()

    @pytest.mark.usefixtures("ray_session")
    def test_phash_dedup_groups(self, planted_dir):
        """Identical payloads collapse to one thumbnail-key group with
        the id-minimal keeper; distinct payloads stay singletons."""
        from ragflow_ray.ops.multimodal import media_phash_dedup

        df = media_phash_dedup(planted_dir)
        # docs 0 and 1 share text -> same payload -> same pooled key
        assert len(df) == 5
        row = df[df.keeper_doc_id == 0]
        assert len(row) == 1 and int(row.n_members.iloc[0]) == 2
        assert (df[df.keeper_doc_id != 0].n_members == 1).all()

    @pytest.mark.usefixtures("ray_session")
    def test_embedding_hot_label_subblocks(self, tmp_path):
        """A label beyond max_label_size sub-blocks instead of dying
        quadratically; planted identical vectors are still paired."""
        from ragflow_ray.ops.dedup import embedding_near_dups

        rs = np.random.RandomState(5)
        vecs = rs.randn(300, 16).astype(np.float32)
        vecs[7] = vecs[3]  # identical pair -> same LSH sub-block always
        emb = pa.table(
            {
                "vec_id": pa.array(range(300), type=pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs],
                                      type=pa.list_(pa.float32())),
                "label": pa.array([0] * 300, type=pa.int32()),
            }
        )
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        pairs = embedding_near_dups(str(tmp_path), threshold=0.99,
                                    max_label_size=50)
        assert (3, 7) in set(zip(pairs.vec_a, pairs.vec_b))


class TestSimhashTables:
    """Round-3 two-level 28-bit LSH (VERDICT r02 task 9)."""

    def test_masks_complete_for_hamming_3_exhaustive(self):
        """EVERY xor pattern with <=3 set bits leaves at least one of
        the 16 table masks clean (the pigeonhole guarantee, checked
        exhaustively over all C(64,3)+C(64,2)+64 = 43744 patterns)."""
        from itertools import combinations

        from ragflow_ray.ops.dedup import _TABLE_MASKS

        masks = [int(m) for m in _TABLE_MASKS]
        for k in (1, 2, 3):
            for bits in combinations(range(64), k):
                x = 0
                for b in bits:
                    x |= 1 << b
                assert any((x & m) == 0 for m in masks), f"no clean table for {bits}"

    def test_hot_16bit_bucket_spreads_without_truncation(self):
        """Signatures engineered to collide under the old 16-bit bands
        (identical low chunk, random elsewhere) spread across 28-bit
        keys: the largest bucket stays tiny and no truncation fires."""
        import logging

        import pandas as pd

        from ragflow_ray.ops.dedup import _TABLE_MASKS  # noqa: F401 (import check)

        rs = np.random.RandomState(5)
        n = 20_000
        sims = (rs.randint(0, 1 << 48, size=n).astype(np.uint64) << np.uint64(16))
        # all share chunk0 == 0 -> ONE bucket of 20k under 16-bit bands
        chunks = [(sims >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)]
        keys = np.empty((n, 16), dtype=np.uint64)
        for b in range(4):
            others = [j for j in range(4) if j != b]
            rest = sum(chunks[j] << np.uint64(16 * r) for r, j in enumerate(others))
            for s in range(4):
                sub = (rest >> np.uint64(12 * s)) & np.uint64(0xFFF)
                keys[:, 4 * b + s] = chunks[b] | (sub << np.uint64(16))
        # for each of the 4 tables covering chunk0 the bucket sizes are
        # bounded by the 12-bit sub-key split (expected ~n/4096)
        for t in range(4):
            _, counts = np.unique(keys[:, t], return_counts=True)
            assert counts.max() < 200  # vs 20_000 in one bucket before


@pytest.mark.usefixtures("ray_session")
class TestHighDupDistributed:
    """Round-3 (VERDICT r02 task 1): the candidate-pair set stays a
    Dataset end-to-end; a planted clique runs through the join branch
    without driver-side pair materialization."""

    def test_minhash_clique_join_branch(self, tmp_path):
        from ragflow_ray.ops.dedup import minhash_near_dups

        rs = np.random.RandomState(9)
        vocab = [f"w{i}" for i in range(600)]
        base = " ".join(vocab[rs.randint(0, 600)] for _ in range(40))
        texts = [base] * 300 + [
            " ".join(vocab[rs.randint(0, 600)] for _ in range(40))
            for _ in range(700)
        ]
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        pairs = minhash_near_dups(str(tmp_path), broadcast_limit=0).to_pandas()
        # the full clique survives the exact-Jaccard verify
        assert len(pairs) >= 300 * 299 // 2

    def test_ngram_many_small_cliques_join_branch(self, tmp_path):
        """df-capped grams: cliques below df_cap dedupe exactly through
        the distributed branch (a clique ABOVE the cap is correctly
        excluded by the deterministic stop-gram rule — mirrored in the
        SQL oracle)."""
        from ragflow_ray.ops.dedup import ngram_jaccard_dups

        rs = np.random.RandomState(10)
        vocab = [f"w{i}" for i in range(800)]
        texts = []
        for c in range(40):
            base = " ".join(vocab[rs.randint(0, 800)] for _ in range(30))
            texts.extend([base] * 10)  # 40 cliques of 10 (df=10 <= 64)
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        pairs = ngram_jaccard_dups(str(tmp_path), broadcast_limit=0).to_pandas()
        assert len(pairs) == 40 * (10 * 9 // 2)
        assert (pairs["jaccard_x10000"] == 10000).all()

    def test_dedup_clusters_transitive(self, tmp_path):
        """a~b and b~c near-dups must land in ONE cluster with keeper a
        even though (a, c) may not meet the pair threshold directly —
        the property pair-level dedup cannot give you."""
        from ragflow_ray.ops.dedup import dedup_clusters

        rs = np.random.RandomState(21)
        vocab = [f"w{i}" for i in range(400)]
        base = [vocab[rs.randint(0, 400)] for _ in range(40)]
        mid = list(base); mid[0] = "zzz0"; mid[1] = "zzz1"
        far = list(mid); far[-1] = "yyy0"; far[-2] = "yyy1"
        texts = [" ".join(base), " ".join(mid), " ".join(far)] + [
            " ".join(vocab[rs.randint(0, 400)] for _ in range(40))
            for _ in range(200)
        ]
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = dedup_clusters(str(tmp_path))
        keepers = dict(zip(df.doc_id, df.cluster_keeper))
        assert keepers.get(0) == 0 and keepers.get(1) == 0 and keepers.get(2) == 0


@pytest.mark.usefixtures("ray_session")
class TestCuration:
    """Round-3 corpus-curation ops (ops/curation.py)."""

    def test_decontaminate_planted_overlap(self, tmp_path):
        from ragflow_ray.ops.curation import decontaminate

        rs = np.random.RandomState(13)
        vocab = [f"w{i}" for i in range(300)]
        texts = [" ".join(vocab[rs.randint(0, 300)] for _ in range(30))
                 for _ in range(60)]
        # doc 40 copies 12 consecutive words from benchmark doc 3 ->
        # 5 shared 8-grams; doc 50 shares nothing
        frag = texts[3].split(" ")[4:16]
        texts[40] = " ".join(["x0", "x1"] + frag + ["x2", "x3"])
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = decontaminate(str(tmp_path), n_benchmark=20)
        hits = dict(zip(df.doc_id, df.n_hits))
        assert hits.get(40) == 5
        # benchmark docs themselves are excluded from the scan
        assert all(i >= 20 for i in df.doc_id)

    def test_stratified_sample_deterministic(self):
        from ragflow_ray.ops.curation import stratified_sample

        a = stratified_sample("/root/testdata/sf0.001")
        b = stratified_sample("/root/testdata/sf0.001")
        assert a.equals(b)
        assert 0 < len(a) < 500  # ~10% of 500

    def test_repetition_signals_planted(self, tmp_path):
        from ragflow_ray.ops.curation import repetition_signals

        texts = [
            "spam spam spam spam spam spam spam spam",   # one word repeated
            " ".join(f"w{i}" for i in range(40)),         # all distinct
            "a b c a b c a b c a b c",                    # repeated trigrams
        ]
        docs = pa.table(
            {"doc_id": pa.array(range(3), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = repetition_signals(str(tmp_path)).set_index("doc_id")
        assert df.loc[0, "top_word_x1000"] == 1000 and df.loc[0, "keep"] == 0
        assert df.loc[1, "top_word_x1000"] == 1000 // 40
        assert df.loc[1, "dup_trigram_x1000"] == 0 and df.loc[1, "keep"] == 1
        # "a b c" x4 etc: every one of the 10 trigram slots is a repeat
        assert df.loc[2, "dup_trigram_x1000"] == 1000 and df.loc[2, "keep"] == 0


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_events_order_asof_planted(self, tmp_path):
        from ragflow_ray.ops.relational import events_order_asof

        ev = pa.table({
            "event_id": pa.array([0, 1, 2], type=pa.int64()),
            "ts": pa.array(
                pd.to_datetime(
                    ["2024-01-10 12:00:00", "2024-01-02 00:00:00",
                     "2024-03-01 09:30:00"]
                ).astype("datetime64[us]")
            ),
            "user_id": pa.array([7, 7, 9], type=pa.int64()),
        })
        orr = pa.table({
            "o_orderkey": pa.array([100, 101, 102], type=pa.int64()),
            "o_custkey": pa.array([7, 7, 7], type=pa.int64()),
            # 101 and 102 tie on the date: the higher key must win
            "o_orderdate": pa.array(
                pd.to_datetime(
                    ["2024-01-05", "2024-01-10", "2024-01-10"]
                ).astype("datetime64[us]")
            ),
        })
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        pq.write_table(orr, str(tmp_path / "orders.parquet"))
        # both plan branches must agree: broadcast (default) and the
        # forced co-partition shuffle path
        for limit in (5_000_000, 0):
            df = events_order_asof(str(tmp_path), broadcast_limit=limit)
            df = df.set_index("event_id")
            # event 0 (Jan 10): both Jan-10 orders eligible -> key 102
            assert df.loc[0, "o_orderkey"] == 102
            # event 1 (Jan 2): before any order -> -1
            assert df.loc[1, "o_orderkey"] == -1
            assert df.loc[1, "o_orderdate_days"] == -1
            # event 2: user 9 never ordered -> -1
            assert df.loc[2, "o_orderkey"] == -1


@pytest.mark.usefixtures("ray_session")
class TestPacking:
    def test_pack_sequences_planted(self, tmp_path):
        from ragflow_ray.ops.curation import pack_sequences

        # 7 docs x 3 tokens, seq_len=10, bucket=4: exercises both the
        # intra-bucket cumsum and the cross-bucket offset handoff
        texts = ["tok tok tok"] * 7
        docs = pa.table(
            {"doc_id": pa.array(range(7), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = pack_sequences(str(tmp_path), seq_len=10, bucket=4)
        assert list(df.doc_id) == list(range(7))
        # prefix = 0,3,6,9,12,15,18
        assert list(df.seq_index) == [0, 0, 0, 0, 1, 1, 1]
        assert list(df.seq_offset) == [0, 3, 6, 9, 2, 5, 8]

    def test_pack_branches_agree(self):
        """broadcast_limit=0 forces the two-exchange distributed
        placement; the default gates into the driver cumsum —
        identical frames either way."""
        from ragflow_ray.ops.curation import curate_and_pack, pack_sequences

        sf = "/root/testdata/sf0.001"
        pd.testing.assert_frame_equal(
            pack_sequences(sf), pack_sequences(sf, broadcast_limit=0))
        pd.testing.assert_frame_equal(
            curate_and_pack(sf), curate_and_pack(sf, broadcast_limit=0))

    def test_training_order_deterministic(self):
        from ragflow_ray.ops.curation import training_order

        a = training_order("/root/testdata/sf0.001")
        b = training_order("/root/testdata/sf0.001")
        assert a.equals(b)
        # a different seed gives a different permutation
        c = training_order("/root/testdata/sf0.001", seed="epoch1")
        assert list(a.doc_id) != list(c.doc_id)


@pytest.mark.usefixtures("ray_session")
class TestIncrementalDedup:
    def test_new_batch_against_corpus(self, tmp_path):
        from ragflow_ray.ops.dedup import dedup_incremental

        texts = [
            "alpha beta gamma delta",        # 0 old
            "epsilon zeta eta theta",        # 1 old
            "delta gamma beta alpha",        # 2 new: permutation of 0
            "iota kappa lambda mu",          # 3 new: novel
        ]
        docs = pa.table(
            {"doc_id": pa.array(range(4), type=pa.int64()),
             "text": pa.array(texts),
             "source": pa.array(["old", "old", "incoming", "incoming"])}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = dedup_incremental(str(tmp_path), new_source="incoming")
        assert list(df.doc_id) == [2]
        assert list(df.dup_of) == [0]


@pytest.mark.usefixtures("ray_session")
class TestMixingWindows:
    def test_mixture_rates_applied(self, tmp_path):
        from ragflow_ray.ops.curation import mixture_sample

        texts = [f"doc number {i} with deterministic content" for i in range(120)]
        srcs = ["keepall"] * 40 + ["half"] * 40 + ["tail"] * 40
        docs = pa.table(
            {"doc_id": pa.array(range(120), type=pa.int64()),
             "text": pa.array(texts), "source": pa.array(srcs)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = mixture_sample(str(tmp_path),
                            rates_pct={"keepall": 100, "half": 50},
                            default_pct=0)
        kept = df.source.value_counts().to_dict()
        assert kept.get("keepall") == 40          # rate 100: all kept
        assert 0 < kept.get("half", 0) < 40       # rate 50: strict subset
        assert "tail" not in kept                 # default 0: dropped

    def test_sliding_windows_cover_each_event_twice(self, tmp_path):
        from ragflow_ray.ops.relational import events_sliding

        ts = pd.to_datetime(
            ["2024-01-01 00:10:00", "2024-01-01 00:40:00",
             "2024-01-01 01:10:00"]
        ).astype("datetime64[us]")
        ev = pa.table({
            "event_id": pa.array([0, 1, 2], type=pa.int64()),
            "ts": pa.array(ts),
            "event_type": pa.array(["click"] * 3),
        })
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        df = events_sliding(str(tmp_path))
        # every event lands in exactly window/hop = 2 windows
        assert df.n_events.sum() == 6
        by_win = dict(zip(df.window_start_us, df.n_events))
        h = 30 * 60 * 1_000_000
        base = int(pd.Timestamp("2024-01-01").value // 1000)
        # window starting 00:00 contains events at 00:10 and 00:40
        assert by_win[base] == 2


@pytest.mark.usefixtures("ray_session")
class TestCurateAndPack:
    def test_gate_dedup_pack_composition(self, tmp_path):
        from ragflow_ray.ops.curation import curate_and_pack

        good = ("the quick brown fox jumps over the lazy dog and keeps "
                "running to the end of the field today again")  # 20 tokens, has stopwords
        texts = [
            good,                 # 0: survives
            good,                 # 1: exact dup of 0 -> dropped by dedup
            "short text",         # 2: fails the 16-token gate
            good + " extended",   # 3: survives (21 tokens, distinct hash)
        ]
        docs = pa.table(
            {"doc_id": pa.array(range(4), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = curate_and_pack(str(tmp_path), seq_len=30, bucket=2)
        assert list(df.doc_id) == [0, 3]
        assert list(df.seq_index) == [0, 0]
        # doc 3 starts right after doc 0's 20 tokens
        assert list(df.seq_offset) == [0, 20]


@pytest.mark.usefixtures("ray_session")
class TestPassageVocab:
    """Round-3 additions: passage-level dedup + vocabulary top-k."""

    def test_passage_dedup_planted_boilerplate(self, tmp_path):
        from ragflow_ray.ops.dedup import passage_dedup

        rs = np.random.RandomState(31)
        vocab = [f"w{i}" for i in range(300)]
        header = " ".join(vocab[i] for i in range(16))  # one aligned window
        texts = [
            header + " " + " ".join(vocab[rs.randint(0, 300)] for _ in range(24))
            for _ in range(5)
        ] + [
            " ".join(vocab[rs.randint(0, 300)] for _ in range(40))
            for _ in range(50)
        ]
        # a doc whose own window repeats (multiplicity counts)
        texts.append(header + " " + header)
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = passage_dedup(str(tmp_path))
        got = dict(zip(df.doc_id, df.n_dup_passages))
        for d in range(5):
            assert got.get(d, 0) >= 1  # header window flagged
        self_rep = len(texts) - 1
        assert got.get(self_rep, 0) == 2  # both copies of its window
        # doc 0 = 16-word header + 24 random words joined by one
        # space -> 40 split(' ') words -> ceil(40/16) = 3 passages
        totals = dict(zip(df.doc_id, df.n_passages))
        assert totals[0] == (40 + 15) // 16

    def test_passage_dedup_no_duplicates(self, tmp_path):
        """A dedup-free corpus must return the empty frame, not crash
        the join with schema-less empty partitions (round-3 review)."""
        from ragflow_ray.ops.dedup import passage_dedup

        texts = [" ".join(f"u{d}w{i}" for i in range(40)) for d in range(80)]
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = passage_dedup(str(tmp_path))
        assert df.empty
        assert list(df.columns) == ["doc_id", "n_passages", "n_dup_passages"]
        assert all(df[c].dtype == "int64" for c in df.columns)

    def test_passage_dedup_single_pair(self, tmp_path):
        """One duplicated pair: the dup-hash side is a single row —
        the join must not blow up on over-partitioning."""
        from ragflow_ray.ops.dedup import passage_dedup

        texts = [" ".join(f"u{d}w{i}" for i in range(16)) for d in range(60)]
        texts.append(texts[0])  # doc 60 repeats doc 0's only window
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = passage_dedup(str(tmp_path))
        assert list(df.doc_id) == [0, 60]
        assert list(df.n_dup_passages) == [1, 1]

    def test_vocab_topk_counts(self, tmp_path):
        from ragflow_ray.ops.textstats import vocab_topk

        texts = ["b a a", "a b c", "c c d"]
        langs = ["en", "en", "fr"]
        docs = pa.table(
            {"doc_id": pa.array(range(3), type=pa.int64()),
             "text": pa.array(texts), "lang": pa.array(langs)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = vocab_topk(str(tmp_path), k=2)
        en = df[df.lang == "en"].reset_index(drop=True)
        fr = df[df.lang == "fr"].reset_index(drop=True)
        assert list(en.word) == ["a", "b"] and list(en.n) == [3, 2]
        assert list(en["rank"]) == [1, 2]
        assert list(fr.word) == ["c", "d"] and list(fr.n) == [2, 1]


@pytest.mark.usefixtures("ray_session")
class TestBpe:
    """BPE trainer ops: pair counting + the merge loop."""

    def _write(self, tmp_path, texts):
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts),
             "n_chars": pa.array([len(t) for t in texts], type=pa.int64())}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))

    def test_pair_counts_hand_example(self, tmp_path):
        from ragflow_ray.ops.textstats import bpe_pair_counts

        self._write(tmp_path, ["low lower", "Lowest!"])  # 'L' breaks the run
        df = bpe_pair_counts(str(tmp_path))
        got = dict(zip(df["pair"], df["n"]))
        # low, lower, owest: lo x2, ow x3, we x2, er, es, st
        assert got == {"lo": 2, "ow": 3, "we": 2, "er": 1, "es": 1, "st": 1}
        # sorted by count desc then pair asc
        assert list(df["pair"])[:3] == ["ow", "lo", "we"]

    def test_train_merges_hand_example(self, tmp_path):
        from ragflow_ray.ops.textstats import bpe_train

        # vocab: low x3 (one doc has it twice), lowest x2
        self._write(tmp_path, ["low low lowest", "low lowest"])
        df = bpe_train(str(tmp_path), n_merges=3)
        # step1: lo=5 ow=5 we=2 es=2 st=2 -> tie lo/ow -> 'lo' wins lexicographically
        # step2: (lo,w)=5 wins
        # step3: ties at 2: (es,?)... symbols now: low, low+est parts
        assert (df.loc[0, "left"], df.loc[0, "right"], df.loc[0, "n"]) == ("l", "o", 5)
        assert (df.loc[1, "left"], df.loc[1, "right"], df.loc[1, "n"]) == ("lo", "w", 5)
        assert df.loc[2, "n"] == 2 and (df.loc[2, "left"], df.loc[2, "right"]) == ("e", "s")

    def test_train_stops_when_dry(self, tmp_path):
        from ragflow_ray.ops.textstats import bpe_train

        self._write(tmp_path, ["a b", "c"])  # no adjacent pairs at all
        df = bpe_train(str(tmp_path), n_merges=4)
        assert len(df) == 0
        assert list(df.columns) == ["step", "left", "right", "n"]


@pytest.mark.usefixtures("ray_session")
class TestLmCrossEntropy:
    def _write(self, tmp_path, texts):
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))

    def test_hand_example(self, tmp_path):
        import math

        from ragflow_ray.ops.curation import lm_cross_entropy

        # corpus: "a b" x2 and "a c" -> C(a)=3, C(ab)=2, C(ac)=1
        self._write(tmp_path, ["a b", "a b", "a c"])
        df = lm_cross_entropy(str(tmp_path))
        assert list(df.doc_id) == [0, 1, 2]
        assert list(df.n_bigrams) == [1, 1, 1]
        ab = round(math.log(3) - math.log(2), 6)
        ac = round(math.log(3) - math.log(1), 6)
        assert list(df.cross_entropy) == [ab, ab, ac]

    def test_short_docs_excluded(self, tmp_path):
        from ragflow_ray.ops.curation import lm_cross_entropy

        self._write(tmp_path, ["single", "", "two words"])
        df = lm_cross_entropy(str(tmp_path))
        assert list(df.doc_id) == [2]

    def test_join_path_matches_broadcast(self, tmp_path):
        from ragflow_ray.ops.curation import lm_cross_entropy

        rs = np.random.RandomState(7)
        # vocab must be alphabetic: [a-z]+ words, 40 distinct
        vocab = [a + b for a in "abcdefgh" for b in "vwxyz"]
        texts = [
            " ".join(vocab[rs.randint(0, 40)] for _ in range(30))
            for _ in range(60)
        ]
        self._write(tmp_path, texts)
        a = lm_cross_entropy(str(tmp_path))
        b = lm_cross_entropy(str(tmp_path), broadcast_limit=0)  # force join
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestHourlyUniquesBranches:
    def test_driver_and_copartition_agree(self):
        """broadcast_limit=0 forces the hour-key co-partition; the
        default gates into the driver nunique — identical frames."""
        from ragflow_ray.ops.relational import events_hourly_uniques

        sf = "/root/testdata/sf0.001"
        a = events_hourly_uniques(sf)
        b = events_hourly_uniques(sf, broadcast_limit=0)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestCohortRetention:
    def test_driver_and_copartition_agree(self):
        """broadcast_limit=0 forces the user-bucket co-partition; the
        default gates into the driver pass — identical matrices."""
        from ragflow_ray.ops.relational import cohort_retention

        sf = "/root/testdata/sf0.001"
        a = cohort_retention(sf)
        b = cohort_retention(sf, broadcast_limit=0)
        pd.testing.assert_frame_equal(a, b)

    def test_multi_cohort_matrix(self, tmp_path):
        """Hand-built two-cohort stream: users 1/2 sign up in week W,
        user 3 one week later; activity gaps must show up as missing
        (cohort, offset) cells, repeat visits in one week count once."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ragflow_ray.ops.relational import cohort_retention

        day = 86_400_000_000
        monday = ((0 // 7) * 7 + 4) * day + 700 * 7 * day  # a Monday
        rows = [
            (1, monday), (1, monday + day),          # u1 wk0 twice
            (1, monday + 7 * day),                   # u1 wk1
            (2, monday + 2 * day),                   # u2 wk0
            (2, monday + 14 * day),                  # u2 wk2 (skips wk1)
            (3, monday + 8 * day),                   # u3 cohort = wk1
            (3, monday + 15 * day),                  # u3 off 1
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        w0 = (monday // day + 3) // 7
        expect = pd.DataFrame({
            "cohort_week": [w0, w0, w0, w0 + 1, w0 + 1],
            "week_off": [0, 1, 2, 0, 1],
            "n_users": [2, 1, 1, 1, 1],
        }).astype("int64")
        for limit in (2_000_000, 0):
            got = cohort_retention(str(tmp_path), broadcast_limit=limit)
            pd.testing.assert_frame_equal(got, expect)

    def test_rolling_actives_branches_agree(self):
        from ragflow_ray.ops.relational import rolling_active_users

        sf = "/root/testdata/sf0.001"
        a = rolling_active_users(sf)
        b = rolling_active_users(sf, broadcast_limit=0)
        pd.testing.assert_frame_equal(a, b)

    def test_rolling_actives_hand_case(self, tmp_path):
        """u1 active days 0 and 8, u2 day 2 only: day 8's trailing
        7-day window [2..8] holds both users, the eventless gap days
        emit no row, and repeat visits in one day count once."""
        from ragflow_ray.ops.relational import rolling_active_users

        day = 86_400_000_000
        base = 20_000 * day
        rows = [(1, base), (1, base + 3600 * 1_000_000),
                (2, base + 2 * day),
                (1, base + 8 * day)]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        expect = pd.DataFrame({
            "day": [20_000, 20_002, 20_008],
            "dau": [1, 1, 1],
            "wau": [1, 2, 2],
            "stickiness_x1000": [1000, 500, 500],
        }).astype("int64")
        for limit in (2_000_000, 0):
            got = rolling_active_users(str(tmp_path),
                                       broadcast_limit=limit)
            pd.testing.assert_frame_equal(got, expect)

    def test_week_arithmetic_matches_duckdb(self):
        """The Monday-aligned integer week index must agree between
        the engine's pure-integer arithmetic and the oracle's
        DATE_DIFF form on arbitrary microsecond timestamps — this is
        the only place the two sides could drift."""
        import duckdb
        from hypothesis import given, settings
        from hypothesis import strategies as st

        day = 86_400_000_000
        con = duckdb.connect()

        @settings(max_examples=60, deadline=None)
        @given(st.lists(
            st.integers(min_value=0,
                        max_value=4102444800 * 1_000_000),  # ≤ 2100
            min_size=1, max_size=20))
        def check(us_list):
            eng = [(us // day + 3) // 7 for us in us_list]
            df = pd.DataFrame(
                {"ts": pd.to_datetime(np.array(us_list, dtype="int64"),
                                      unit="us")})
            sql = con.execute(
                """SELECT CAST(FLOOR((DATE_DIFF('day',
                       DATE '1970-01-01', ts) + 3) / 7.0) AS BIGINT)
                   FROM df""").fetchall()
            assert [r[0] for r in sql] == eng

        check()

    def test_random_streams_match_oracle(self, tmp_path):
        """Randomized end-to-end pin: arbitrary (user, ts) streams run
        through the Ray operator and the DuckDB oracle SQL from
        __ray_entry__ must produce identical matrices."""
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        from ragflow_ray.ops.relational import cohort_retention

        rng = np.random.default_rng(7)
        base = 1_700_000_000 * 1_000_000
        for trial in range(3):
            n = int(rng.integers(5, 400))
            t = pa.table({
                "user_id": pa.array(
                    rng.integers(0, 40, n), pa.int64()),
                "ts": pa.array(
                    (base + rng.integers(0, 90 * 86_400_000_000, n))
                    .astype("int64"), pa.timestamp("us")),
            })
            d = tmp_path / f"t{trial}"
            d.mkdir()
            pq.write_table(t, d / "events.parquet")
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
            exp = con.execute(
                entry.oracle_sql()["cohort_retention"]).df()
            for c in exp.columns:
                exp[c] = exp[c].astype("int64")
            got = cohort_retention(str(d), broadcast_limit=0)
            pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
class TestHybridTopkBranches:
    def test_broadcast_and_copartition_agree(self):
        """broadcast_limit=0 forces the union + coarse-bucket exchange;
        the default gates into the broadcast-lookup fuse — identical
        frames either way."""
        from ragflow_ray.ops.textstats import hybrid_topk

        sf = "/root/testdata/sf0.001"
        a = hybrid_topk(sf)
        b = hybrid_topk(sf, broadcast_limit=0)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestBpeEncode:
    def test_encode_hand_example(self, tmp_path):
        import hashlib

        from ragflow_ray.ops.textstats import bpe_encode

        texts = ["low low lowest", "low lowest"]
        docs = pa.table(
            {"doc_id": pa.array(range(2), type=pa.int64()),
             "text": pa.array(texts),
             "n_chars": pa.array([len(t) for t in texts], type=pa.int64())}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = bpe_encode(str(tmp_path), n_merges=2)
        # merges: (l,o) then (lo,w) -> 'low'->[low], 'lowest'->[low,e,s,t]
        # doc0: low low lowest -> 1+1+4 = 6 tokens; doc1: low lowest -> 5
        assert list(df.n_tokens_bpe) == [6, 5]
        assert df.loc[0, "sig"] == hashlib.md5(b"low low low e s t").hexdigest()
        assert df.loc[1, "sig"] == hashlib.md5(b"low low e s t").hexdigest()


@pytest.mark.usefixtures("ray_session")
class TestDsirSplit:
    """DSIR importance weights + the content-hash split rollup."""

    def _write(self, tmp_path, texts, langs=None, sources=None):
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts),
             "lang": pa.array(langs or ["en"] * len(texts)),
             "source": pa.array(sources or ["web"] * len(texts))}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))

    def test_dsir_skips_zero_token_docs(self, tmp_path):
        # a whitespace-only doc has no unnest rows on the oracle side;
        # the engine must omit it too (review finding, round 3)
        from ragflow_ray.ops.curation import dsir_importance

        self._write(tmp_path, ["alpha beta", "   \t\n ", "alpha gamma"],
                    langs=["en", "en", "fr"])
        df = dsir_importance(str(tmp_path))
        assert list(df.doc_id) == [0, 2]

    def test_dsir_target_tokens_weigh_positive(self, tmp_path):
        from ragflow_ray.ops.curation import dsir_importance

        # 'en en en' is pure target vocabulary, 'fr fr fr' pure raw-only
        self._write(tmp_path, ["en en en", "fr fr fr"], langs=["en", "fr"])
        df = dsir_importance(str(tmp_path))
        w = dict(zip(df.doc_id, df.dsir_logw))
        assert w[0] > 0 > w[1]

    def test_split_duplicate_texts_share_split(self, tmp_path):
        from ragflow_ray.ops.curation import stratified_split

        self._write(tmp_path, ["same text"] * 50 + ["other"] * 50,
                    sources=["a"] * 50 + ["b"] * 50)
        df = stratified_split(str(tmp_path))
        # every source contributes exactly one (split) row: all 50
        # byte-identical docs hash to the same bucket
        assert (df.groupby("source").size() == 1).all()
        assert df.n_docs.sum() == 100


@pytest.mark.usefixtures("ray_session")
class TestCluster:
    """Distributed Lloyd k-means: the integer-scaled partial sums make
    every round bit-deterministic under any batching/parallelism."""

    def test_kmeans_batching_independence(self):
        from ragflow_ray.ops.cluster import kmeans_clusters

        a = kmeans_clusters("/root/testdata/sf0.001", batch_size=32)
        b = kmeans_clusters("/root/testdata/sf0.001", batch_size=4096)
        pd.testing.assert_frame_equal(a, b)

    def test_semdedup_keep_is_prefix_closed(self):
        from ragflow_ray.ops.cluster import semdedup

        df = semdedup("/root/testdata/sf0.001")
        # every dropped vector names an id-smaller KEPT keeper in its
        # own cluster
        kept = set(df[df.keep == 1].vec_id)
        dropped = df[df.keep == 0]
        assert (dropped.dup_of < dropped.vec_id).all()
        assert set(dropped.dup_of).issubset(kept)
        by_id = dict(zip(df.vec_id, df.cluster))
        assert all(by_id[d] == c for d, c in
                   zip(dropped.dup_of, dropped.cluster))


@pytest.mark.usefixtures("ray_session")
class TestSegmentDedupJoinBranch:
    def test_join_branch_matches_broadcast(self, tmp_path):
        """broadcast_limit=0 forces the anti-join path; both branches
        must agree, including a FULLY-duplicated doc (the sentinel row
        is what keeps it from vanishing in the join branch)."""
        from ragflow_ray.ops.dedup import segment_dedup_clean

        boiler = " ".join(f"b{i}" for i in range(10))
        texts = [
            boiler,                                   # fully duplicated
            boiler,                                   # fully duplicated
            " ".join(f"u{i}" for i in range(10)) + " " + boiler,
        ] + [" ".join(f"f{d}w{i}" for i in range(20)) for d in range(20)]
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        sf = str(tmp_path)
        b = segment_dedup_clean(sf).to_pandas()
        j = segment_dedup_clean(sf, broadcast_limit=0).to_pandas()
        pd.testing.assert_frame_equal(
            b.reset_index(drop=True), j.reset_index(drop=True))
        got = b.set_index("doc_id")
        assert got.loc[0, "clean_text"] == "" and got.loc[0, "n_removed"] == 1
        assert got.loc[2, "n_removed"] == 1
        assert got.loc[2, "clean_text"].startswith("u0")


@pytest.mark.usefixtures("ray_session")
class TestSubstringDedup:
    """Stride-1 exact substring dedup (Lee et al. 2022 style): a
    duplicated run is cut at ANY word offset, unlike the aligned
    segment_dedup_clean."""

    def _corpus(self, tmp_path, texts):
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_unaligned_duplicate_cut(self, tmp_path):
        from ragflow_ray.ops.dedup import substring_dedup

        boiler = " ".join(f"b{i}" for i in range(16))
        uniq = [" ".join(f"u{d}w{i}" for i in range(10)) for d in range(3)]
        texts = [
            uniq[0] + " " + boiler,          # boiler at offset 10
            boiler + " " + uniq[1],          # boiler at offset 0
            uniq[2],                          # untouched
        ] + [" ".join(f"f{d}w{i}" for i in range(30)) for d in range(40)]
        df = substring_dedup(self._corpus(tmp_path, texts)).to_pandas()
        got = df.set_index("doc_id")
        # both copies cut despite different offsets
        assert got.loc[0, "clean_text"] == uniq[0]
        assert got.loc[0, "n_removed"] == 16
        assert got.loc[1, "clean_text"] == uniq[1]
        assert got.loc[1, "n_removed"] == 16
        assert got.loc[2, "clean_text"] == texts[2]
        assert got.loc[2, "n_removed"] == 0

    def test_overlapping_windows_merge_to_maximal_range(self, tmp_path):
        """A 20-word duplicated run -> 5 overlapping dup windows whose
        coverage union is exactly the 20 words, not 5 * 16."""
        from ragflow_ray.ops.dedup import substring_dedup

        run = " ".join(f"r{i}" for i in range(20))
        texts = [
            " ".join(f"a{i}" for i in range(8)) + " " + run,
            run + " " + " ".join(f"c{i}" for i in range(8)),
        ] + [" ".join(f"f{d}w{i}" for i in range(30)) for d in range(30)]
        df = substring_dedup(self._corpus(tmp_path, texts)).to_pandas()
        got = df.set_index("doc_id")
        assert got.loc[0, "n_removed"] == 20
        assert got.loc[0, "clean_text"] == " ".join(f"a{i}" for i in range(8))
        assert got.loc[1, "n_removed"] == 20

    def test_join_branch_matches_broadcast(self, tmp_path):
        from ragflow_ray.ops.dedup import substring_dedup

        boiler = " ".join(f"b{i}" for i in range(18))
        texts = [
            boiler + " tail" + str(d) if d % 3 == 0
            else " ".join(f"d{d}w{i}" for i in range(25))
            for d in range(24)
        ]
        sf = self._corpus(tmp_path, texts)
        a = substring_dedup(sf).to_pandas()
        b = substring_dedup(sf, broadcast_limit=0).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_short_and_empty_docs_pass_through(self, tmp_path):
        from ragflow_ray.ops.dedup import substring_dedup

        texts = ["", "one two three", "short doc here", "", "x"]
        df = substring_dedup(self._corpus(tmp_path, texts)).to_pandas()
        assert list(df.clean_text) == texts
        assert list(df.n_removed) == [0] * len(texts)

    def test_self_repeat_counts_multiplicity(self, tmp_path):
        """A window repeated WITHIN one doc is duplicated (count >= 2
        over positions) and every copy is cut."""
        from ragflow_ray.ops.dedup import substring_dedup

        run = " ".join(f"s{i}" for i in range(16))
        texts = [run + " " + run] + [
            " ".join(f"f{d}w{i}" for i in range(30)) for d in range(20)
        ]
        df = substring_dedup(self._corpus(tmp_path, texts)).to_pandas()
        got = df.set_index("doc_id")
        # windows at offsets 0 and 16 are equal -> both cut -> all 32
        # words covered, the doc is emptied (but the row survives)
        assert got.loc[0, "n_removed"] == 32
        assert got.loc[0, "clean_text"] == ""


@pytest.mark.usefixtures("ray_session")
class TestRegionalRevenue:
    """TPC-H Q5-style multi-way join: both size-adaptive branches must
    agree (the oracle test exercises the broadcast branch)."""

    def test_join_branch_matches_broadcast(self):
        from ragflow_ray.ops.relational import regional_revenue

        sf = "/root/testdata/sf0.001"
        a = regional_revenue(sf)
        b = regional_revenue(sf, broadcast_limit=0)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["n_name", "revenue_c4"]
        assert (a["revenue_c4"] > 0).all()

    def test_empty_date_window(self):
        from ragflow_ray.ops.relational import regional_revenue

        df = regional_revenue(
            "/root/testdata/sf0.001",
            date_lo="1990-01-01", date_hi="1990-01-02",
        )
        assert df.empty
        assert list(df.columns) == ["n_name", "revenue_c4"]


@pytest.mark.usefixtures("ray_session")
class TestEventsRangeJoin:
    def _events(self, tmp_path, rows):
        t = pa.table(
            {"event_id": pa.array([r[0] for r in rows], type=pa.int64()),
             "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                             type=pa.timestamp("us")),
             "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
             "event_type": pa.array([r[3] for r in rows]),
             "value": pa.array([0.0] * len(rows)),
             "props": pa.array([""] * len(rows))}
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_halfopen_boundaries(self, tmp_path):
        from ragflow_ray.ops.relational import events_range_join

        rows = [
            # user 1: purchase at 12:00; clicks at exactly 11:00
            # (included: t-W), 11:30 (in), 12:00 (excluded: = t)
            (0, "2024-01-01 11:00:00", 1, "click"),
            (1, "2024-01-01 11:30:00", 1, "click"),
            (2, "2024-01-01 12:00:00", 1, "click"),
            (3, "2024-01-01 12:00:00", 1, "purchase"),
            # user 2: clicks from another user never count
            (4, "2024-01-01 11:59:00", 2, "click"),
            # user 3: zero-click purchase still reported
            (5, "2024-01-01 09:00:00", 3, "purchase"),
            # user 1: purchase crossing a bucket boundary (12:30 looks
            # back into both the 12:00 and 11:00 buckets)
            (6, "2024-01-01 12:30:00", 1, "purchase"),
        ]
        df = events_range_join(self._events(tmp_path, rows))
        got = dict(zip(df.event_id, df.n_prior_clicks))
        # purchase 6 window [11:30, 12:30): clicks at 11:30 (= t-W,
        # included) and 12:00 — both qualify
        assert got == {3: 2, 5: 0, 6: 2}


@pytest.mark.usefixtures("ray_session")
class TestNbLangClassify:
    def test_separable_corpus_is_learned(self, tmp_path):
        """Distinct per-language vocabularies: the hashed-NB model must
        classify every training doc correctly (the shared testdata has
        identical vocab across lang labels, so the oracle there only
        checks majority-prior behavior)."""
        from ragflow_ray.ops.curation import nb_lang_classify

        rs = np.random.RandomState(11)
        vocab = {
            "aa": [f"aw{i}" for i in range(40)],
            "bb": [f"bw{i}" for i in range(40)],
            "cc": [f"cw{i}" for i in range(40)],
        }
        texts, langs = [], []
        for lang, words in vocab.items():
            for _ in range(30):
                texts.append(" ".join(rs.choice(words, 25)))
                langs.append(lang)
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts), "lang": pa.array(langs)}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = nb_lang_classify(str(tmp_path))
        assert len(df) == 90
        assert df["correct"].all()

    def test_tokenless_docs_skipped(self, tmp_path):
        from ragflow_ray.ops.curation import nb_lang_classify

        docs = pa.table(
            {"doc_id": pa.array([0, 1, 2], type=pa.int64()),
             "text": pa.array(["hello world", "", "   "]),
             "lang": pa.array(["en", "en", "en"])}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = nb_lang_classify(str(tmp_path))
        assert list(df.doc_id) == [0]
        assert df.iloc[0]["pred_lang"] == "en"


@pytest.mark.usefixtures("ray_session")
class TestHll:
    def test_estimator_regime_accuracy(self, tmp_path):
        """A corpus with ~40k distinct tokens leaves the linear-counting
        regime; the HLL estimate must land within 5% (theory: 1.04/64 ≈
        1.6% std) and the distributed register merge must equal a
        single-pass local computation."""
        import re as _re
        from ragflow_ray.ops.textstats import (
            _hll_partial, hll_distinct_tokens, hll_estimate,
        )

        rs = np.random.RandomState(5)
        texts = [
            " ".join(f"tok{rs.randint(0, 60000)}" for _ in range(400))
            for _ in range(100)
        ]
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts),
             "source": pa.array(["web"] * len(texts)),
             "n_chars": pa.array([len(t) for t in texts], type=pa.int64())}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))

        df = hll_distinct_tokens(str(tmp_path))
        assert list(df.source) == ["web"]
        true = len({w for t in texts for w in t.split()})
        est = int(df.est_distinct.iloc[0])
        assert abs(est - true) / true < 0.05

        # distributed (batched max-merge) == one local pass
        regs = _hll_partial(texts, _re.compile(r"[^ \t\n\r\f\v]+"))
        assert est == hll_estimate(regs)

    def test_small_range_linear_counting(self, tmp_path):
        from ragflow_ray.ops.textstats import hll_distinct_tokens

        docs = pa.table(
            {"doc_id": pa.array([0, 1], type=pa.int64()),
             "text": pa.array(["a b c d", "c d e"]),
             "source": pa.array(["s1", "s1"]),
             "n_chars": pa.array([7, 5], type=pa.int64())}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = hll_distinct_tokens(str(tmp_path))
        assert int(df.est_distinct.iloc[0]) == 5  # exact in LC regime


@pytest.mark.usefixtures("ray_session")
class TestHeavyHitters:
    def test_long_tail_pruned_exactly(self, tmp_path):
        """Heavy tokens planted against a huge unique long tail: the
        MG candidate pass must not lose any true heavy hitter and the
        verify pass must produce exact counts."""
        from ragflow_ray.ops.textstats import heavy_hitters

        rs = np.random.RandomState(17)
        texts = []
        for d in range(60):
            toks = [f"u{d}x{i}" for i in range(150)]      # unique tail
            toks += ["hot"] * 30 + ["warm"] * 12           # planted heavy
            rs.shuffle(toks)
            texts.append(" ".join(toks))
        docs = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts),
             "lang": pa.array(["en"] * len(texts))}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        # total = 60*192 = 11520; floor(1% of N) = 115;
        # hot = 1800 > 115 heavy, warm = 720 > 115 heavy, tail = 1 each
        df = heavy_hitters(str(tmp_path))
        assert list(df.token) == ["hot", "warm"]
        assert list(df.cnt) == [1800, 720]


@pytest.mark.usefixtures("ray_session")
class TestRaptorTree:
    def test_tree_shape_and_consistency(self):
        from ragflow_ray.ops.cluster import raptor_tree

        df = raptor_tree("/root/testdata/sf0.001")
        assert set(df.columns) == {"vec_id", "l0", "l1", "leaf_size"}
        # every level-0 cluster subclusters into <= k_leaf leaves
        for _, grp in df.groupby("l0"):
            assert grp["l1"].nunique() <= 3
            # leaf_size is consistent within each (l0, l1) leaf
            for _, leaf in grp.groupby("l1"):
                assert (leaf["leaf_size"] == len(leaf)).all()

    def test_batch_size_independence(self):
        """Level-0 integer-scaled sums and the per-group local Lloyd
        must make the tree identical under different batching."""
        from ragflow_ray.ops.cluster import raptor_tree

        a = raptor_tree("/root/testdata/sf0.001", batch_size=4096)
        b = raptor_tree("/root/testdata/sf0.001", batch_size=64)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestPropsExtract:
    def test_dirty_rows_null_skipped(self, tmp_path):
        """Schema-on-read must degrade per-row, not crash: dirty props
        rows count toward n_events but contribute no k values (the
        TRY_CAST semantics of the oracle)."""
        from ragflow_ray.ops.relational import props_extract_stats

        rows = [
            ("click", '{"k": 7}'),
            ("click", '{}'),                 # missing k
            ("click", '{"k": 3.5}'),         # non-integer -> skipped
            ("click", 'not json at all'),
            ("view", '{"k": -2}'),
        ]
        t = pa.table(
            {"event_id": pa.array(range(len(rows)), type=pa.int64()),
             "ts": pa.array([pd.Timestamp("2024-01-01")] * len(rows),
                             type=pa.timestamp("us")),
             "user_id": pa.array([1] * len(rows), type=pa.int64()),
             "event_type": pa.array([r[0] for r in rows]),
             "value": pa.array([0.0] * len(rows)),
             "props": pa.array([r[1] for r in rows])}
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        df = props_extract_stats(str(tmp_path)).set_index("event_type")
        assert df.loc["click", "n_events"] == 4
        assert df.loc["click", "sum_k"] == 7
        assert df.loc["click", "min_k"] == 7
        assert df.loc["click", "max_k"] == 7
        assert df.loc["view", "sum_k"] == -2


@pytest.mark.usefixtures("ray_session")
class TestPqTopk:
    def test_batching_independence_and_shape(self):
        from ragflow_ray.ops.ann import pq_topk

        a = pq_topk("/root/testdata/sf0.001", batch_size=4096)
        # NOT concurrency=4: an actor pool that large starves the
        # 4-CPU test session's read tasks
        b = pq_topk("/root/testdata/sf0.001", batch_size=64)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["q_vec_id", "vec_id", "rank"]
        assert a.groupby("q_vec_id")["rank"].max().eq(10).all()

    def test_adc_recall_against_exact(self):
        """PQ is approximate, but with 8x16 codes over 64 dims the
        exact top-1 (the query itself) should be recalled in the ADC
        top-10 for most queries."""
        from ragflow_ray.ops.ann import pq_topk

        df = pq_topk("/root/testdata/sf0.001")
        hits = sum(
            int(q in set(df[df.q_vec_id == q]["vec_id"]))
            for q in df["q_vec_id"].unique()
        )
        assert hits >= 3  # at least 3 of the 5 queries recall themselves


class TestNewRelationalRandomPin:
    """Random-content pins for the round-5 additions: the engine and
    the driver oracle SQL must agree on arbitrary generated tables,
    not just the shared testdata (guards against content-specific
    luck in the fixed corpora)."""

    @staticmethod
    def _views(con, d):
        import glob
        import os

        for f in glob.glob(str(d) + "/*.parquet"):
            t = os.path.basename(f)[:-8]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")

    @pytest.mark.parametrize("seed", [3, 11, 29])
    def test_daily_revenue_ma7_random(self, tmp_path, seed):
        import duckdb

        import __ray_entry__ as e
        from ragflow_ray.ops.relational import daily_revenue_ma7

        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 400))
        day = 86_400_000_000
        base = 9_000 * day
        ts = base + rng.integers(0, 30, n) * day + rng.integers(
            0, day, n)  # intra-day jitter: truncation must agree
        t = pa.table({
            "o_orderdate": pa.array(ts.astype("int64"),
                                    pa.timestamp("us")),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1.0, 90_000.0, n), 2),
                pa.float64()),
        })
        d = tmp_path / f"ma7-{seed}"
        d.mkdir()
        pq.write_table(t, d / "orders.parquet")
        got = daily_revenue_ma7(str(d))
        con = duckdb.connect()
        self._views(con, d)
        want = con.sql(e.oracle_sql()["daily_revenue_ma7"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @pytest.mark.parametrize("seed", [5, 17, 41])
    def test_event_trend_random(self, tmp_path, seed):
        import duckdb

        import __ray_entry__ as e
        from ragflow_ray.ops.relational import event_trend

        rng = np.random.default_rng(seed)
        n = int(rng.integers(10, 800))
        day = 86_400_000_000
        ts = 15_000 * day + rng.integers(0, 60 * day, n)
        t = pa.table({
            "event_type": pa.array(
                rng.choice(["click", "view", "buy", "err"], n)),
            "ts": pa.array(ts.astype("int64"), pa.timestamp("us")),
        })
        d = tmp_path / f"tr-{seed}"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = event_trend(str(d))
        con = duckdb.connect()
        self._views(con, d)
        want = con.sql(e.oracle_sql()["event_trend"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @pytest.mark.parametrize("seed", [7, 23])
    def test_shipping_priority_random(self, tmp_path, seed):
        """Both plan branches vs the oracle on random 3-table content
        (orphan lineitems, non-BUILDING customers, boundary dates
        included by construction)."""
        import duckdb

        import __ray_entry__ as e
        from ragflow_ray.ops.relational import shipping_priority

        rng = np.random.default_rng(seed)
        n_cust, n_ord, n_li = 40, 200, 900
        day = 86_400_000_000
        cut = pd.Timestamp("1995-06-15").value // 1000  # us
        cust = pa.table({
            "c_custkey": pa.array(np.arange(1, n_cust + 1,
                                            dtype="int64")),
            "c_mktsegment": pa.array(rng.choice(
                ["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust)),
        })
        ots = cut + rng.integers(-90, 90, n_ord) * day
        orders = pa.table({
            "o_orderkey": pa.array(np.arange(1, n_ord + 1,
                                             dtype="int64")),
            "o_custkey": pa.array(rng.integers(
                1, n_cust + 1, n_ord).astype("int64")),
            "o_orderdate": pa.array(ots.astype("int64"),
                                    pa.timestamp("us")),
        })
        lts = cut + rng.integers(-60, 120, n_li) * day
        li = pa.table({
            # orderkeys past n_ord are orphans the join must drop
            "l_orderkey": pa.array(rng.integers(
                1, n_ord + 20, n_li).astype("int64")),
            "l_shipdate": pa.array(lts.astype("int64"),
                                   pa.timestamp("us")),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(10.0, 80_000.0, n_li), 2),
                pa.float64()),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                pa.float64()),
        })
        d = tmp_path / f"q3-{seed}"
        d.mkdir()
        pq.write_table(cust, d / "customer.parquet")
        pq.write_table(orders, d / "orders.parquet")
        pq.write_table(li, d / "lineitem.parquet")
        con = duckdb.connect()
        self._views(con, d)
        want = con.sql(e.oracle_sql()["shipping_priority"]).df()
        for limit in (5_000_000, 0):
            got = shipping_priority(str(d), broadcast_limit=limit)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestTpchRemainingShapes:
    """The last four gated TPC-H shapes (Q12/Q16/Q21/Q22 stand-ins)
    agree across their size-adaptive branches, and the ungated pair
    (Q2/Q20) is pinned against tiny hand-derivable fixtures."""

    def test_q12_q16_q22_branches_agree(self):
        import pandas as pd

        from ragflow_ray.ops.relational import (delay_bucket_priority,
                                                idle_customer_balance,
                                                supplier_count_by_part)

        sf = "/root/testdata/sf0.001"
        pd.testing.assert_frame_equal(
            delay_bucket_priority(sf),
            delay_bucket_priority(sf, broadcast_limit=0))
        pd.testing.assert_frame_equal(
            supplier_count_by_part(sf),
            supplier_count_by_part(sf, driver_limit=0))
        pd.testing.assert_frame_equal(
            supplier_count_by_part(sf),
            supplier_count_by_part(sf, driver_limit=0, n_buckets=7))
        pd.testing.assert_frame_equal(
            idle_customer_balance(sf),
            idle_customer_balance(sf, broadcast_limit=0))

    def test_q21_bucket_count_invariance(self):
        """sole_late_suppliers is single-path (always co-partitions);
        the bucket count must not change the frame."""
        import pandas as pd

        from ragflow_ray.ops.relational import sole_late_suppliers

        sf = "/root/testdata/sf0.001"
        pd.testing.assert_frame_equal(
            sole_late_suppliers(sf), sole_late_suppliers(sf, n_buckets=7))

    def test_q20_dominance_flag_exact(self):
        """dominant_part_suppliers marks exactly the (part, supplier)
        pairs whose quantity exceeds avg_multiple x the per-supplier
        average — re-derived here in pandas from the raw table."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from ragflow_ray.ops.relational import dominant_part_suppliers

        sf = "/root/testdata/sf0.001"
        li = pq.read_table(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"]).to_pandas()
        li["qty"] = np.floor(li["l_quantity"] + 0.5).astype("int64")
        pairs = (li.groupby(["l_partkey", "l_suppkey"], as_index=False)
                 .agg(qty=("qty", "sum")))
        tot = pairs.groupby("l_partkey")["qty"].transform("sum")
        ns = pairs.groupby("l_partkey")["qty"].transform("size")
        dom = pairs[pairs["qty"] * ns > 2 * tot]
        sup = pq.read_table(f"{sf}/supplier.parquet").to_pandas()
        nat = pq.read_table(f"{sf}/nation.parquet").to_pandas()
        nk = set(nat.loc[nat["n_name"] == "NATION_19",
                         "n_nationkey"].tolist())
        skeys = set(sup.loc[sup["s_nationkey"].isin(nk),
                            "s_suppkey"].tolist())
        want = (dom[dom["l_suppkey"].isin(skeys)]
                .groupby("l_suppkey").size())
        out = dominant_part_suppliers(sf)
        got = dict(zip(out["s_suppkey"], out["n_parts_dominated"]))
        assert got == {int(k): int(v) for k, v in want.items()}

    def test_q2_argmin_pack_roundtrip(self):
        """The packed lexicographic MIN decodes to (min unit price,
        min suppkey among the argmins) — checked against a direct
        pandas argmin on the same grid."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from ragflow_ray.ops.relational import min_cost_supplier

        sf = "/root/testdata/sf0.001"
        out = min_cost_supplier(sf)
        assert len(out) > 0
        li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
        li["unit_c2"] = np.floor(
            li["l_extendedprice"] * 100 / li["l_quantity"] + 0.5
        ).astype("int64")
        for _, row in out.head(5).iterrows():
            sub = li[li["l_partkey"] == row["p_partkey"]]
            # restrict to the ASIA suppliers the query saw
            sup = pq.read_table(f"{sf}/supplier.parquet").to_pandas()
            nat = pq.read_table(f"{sf}/nation.parquet").to_pandas()
            reg = pq.read_table(f"{sf}/region.parquet").to_pandas()
            nk = nat.merge(reg, left_on="n_regionkey",
                           right_on="r_regionkey")
            nk = set(nk.loc[nk["r_name"] == "ASIA",
                            "n_nationkey"].tolist())
            sk = set(sup.loc[sup["s_nationkey"].isin(nk),
                             "s_suppkey"].tolist())
            sub = sub[sub["l_suppkey"].isin(sk)]
            mn = int(sub["unit_c2"].min())
            assert int(row["min_unit_c2"]) == mn
            assert int(row["s_suppkey"]) == int(
                sub.loc[sub["unit_c2"] == mn, "l_suppkey"].min())

    def test_q22_integer_threshold_boundary(self):
        """A customer whose balance equals the average exactly is NOT
        above-average (strict >): pinned on a hand-built corpus where
        the boundary case exists by construction."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ragflow_ray.ops.relational import idle_customer_balance

        import tempfile, os
        d = tempfile.mkdtemp(prefix="q22_")
        cust = pa.table({
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": ["a", "b", "c", "d"],
            "c_nationkey": pa.array([0, 0, 0, 0], pa.int32()),
            # avg of positives = (10 + 20 + 30) / 3 = 20.00
            "c_acctbal": [10.0, 20.0, 30.0, -5.0],
            "c_mktsegment": ["BUILDING"] * 4,
        })
        pq.write_table(cust, os.path.join(d, "customer.parquet"))
        orders = pa.table({
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([3], pa.int64()),
            "o_orderstatus": ["O"],
            "o_totalprice": [1.0],
            "o_orderdate": pa.array([pd.Timestamp("2000-06-01")],
                                    pa.timestamp("us")),
            "o_orderpriority": ["1-URGENT"],
        })
        pq.write_table(orders, os.path.join(d, "orders.parquet"))
        out = idle_customer_balance(d)
        # cust 2 sits exactly ON the average -> excluded; cust 3 is
        # above it but recently active -> excluded; no rows survive
        assert len(out) == 0
        out2 = idle_customer_balance(d, broadcast_limit=0)
        pd.testing.assert_frame_equal(out, out2)


class TestAudioEnergyZcr:
    """The windowed energy/ZCR feature math, pinned on hand-built
    waveforms through the REAL encode→decode path."""

    def _run(self, samples, window):
        import pandas as pd

        from ragflow_ray.ops.multimodal import AudioEnergyZcrStage
        from ragflow_ray.parsers.wavdec import encode_wav_pcm16

        import numpy as np
        blob = encode_wav_pcm16(np.asarray(samples, dtype=np.int16),
                                sample_rate=16000)
        stage = AudioEnergyZcrStage(window=window)
        out = stage(pd.DataFrame({"doc_id": [1], "payload": [blob]}))
        return out.iloc[0]

    def test_hand_computed_window(self):
        # two windows of 4: [3, -3, 3, -3] and [0, 5, -5, 0]
        r = self._run([3, -3, 3, -3, 0, 5, -5, 0], window=4)
        assert r["n_windows"] == 2
        assert r["total_energy"] == 4 * 9 + 2 * 25
        # flips: w0 has 3 strict sign changes; w1 only 5*-5 (zeros
        # never flip under the strict-product rule)
        assert r["total_zcr"] == 3 + 1
        assert r["max_window_energy"] == 50

    def test_boundary_pair_not_counted(self):
        # sign change exactly AT the window boundary must not count
        r = self._run([1, 1, -1, -1], window=2)
        assert r["total_zcr"] == 0

    def test_trailing_partial_window_dropped(self):
        r = self._run([2, 2, 2, 2, 9], window=2)
        assert r["n_windows"] == 2
        assert r["total_energy"] == 16  # the lone 9 never enters


class TestMediaFaultIsolation:
    """errors='skip' turns a corrupt payload into a dropped row + a
    counter, never an aborted dataset (the ExtractStage per-document
    discipline applied to the media stages)."""

    def test_resize_stage_skips_bad_payloads(self):
        import numpy as np
        import pandas as pd

        from ragflow_ray.ops.multimodal import ImageResizeStage
        from ragflow_ray.parsers.bmpdec import encode_bmp_rgb24

        good = encode_bmp_rgb24(
            np.full((8, 8, 3), 10, dtype=np.uint8))
        batch = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "payload": [good, b"BMgarbage-not-a-dib", good,
                        b"\x89PNG\r\n\x1a\n truncated"]})
        stage = ImageResizeStage(fake_decode=False, errors="skip")
        out = stage(batch)
        assert list(out["doc_id"]) == [1, 3]
        assert stage.n_decode_errors == 2
        assert (out["resized_sum"] == 10 * 3 * 16).all()

    def test_default_policy_still_raises(self):
        import pandas as pd
        import pytest

        from ragflow_ray.ops.multimodal import ImageResizeStage

        stage = ImageResizeStage(fake_decode=False)
        with pytest.raises(Exception):
            stage(pd.DataFrame({"doc_id": [1],
                                "payload": [b"BMgarbage"]}))


class TestDecodeImageDispatch:
    """decode_image routes on magic bytes across all five container
    families and stays loud for unknown ones."""

    def test_all_magics_route(self):
        import numpy as np

        from ragflow_ray.ops.multimodal import decode_image
        from ragflow_ray.parsers.bmpdec import encode_bmp_rgb24
        from ragflow_ray.parsers.gifdec import encode_gif_gray
        from ragflow_ray.parsers.pngdec import encode_png_rgb
        from ragflow_ray.parsers.tiffdec import encode_tiff_rgb8

        rgb = np.random.default_rng(11).integers(
            0, 256, (8, 8, 3), dtype=np.uint8)
        gray = np.random.default_rng(12).integers(
            0, 256, (8, 8), dtype=np.uint8)
        assert (decode_image(encode_png_rgb(rgb)) == rgb).all()
        assert (decode_image(encode_bmp_rgb24(rgb)) == rgb).all()
        assert (decode_image(encode_tiff_rgb8(rgb)) == rgb).all()
        assert (decode_image(encode_gif_gray(gray))[:, :, 0] == gray).all()

    def test_unknown_magic_raises(self):
        import pytest

        from ragflow_ray.ops.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"RIFFxxxxWEBPVP8 ")


class TestAudioPitchLags:
    """The windowed autocorrelation argmax, pinned on a hand-built
    periodic waveform through the real encode→decode path."""

    def test_planted_period_wins(self):
        import numpy as np
        import pandas as pd

        from ragflow_ray.ops.multimodal import AudioPitchStage
        from ragflow_ray.parsers.wavdec import encode_wav_pcm16

        # strong period-12 square wave: lag 12 must maximize r(k)
        i = np.arange(256)
        s = np.where((i // 6) % 2 == 0, 9000, -9000).astype(np.int16)
        blob = encode_wav_pcm16(s, sample_rate=16000)
        stage = AudioPitchStage(window=256, lag_lo=8, lag_hi=32)
        out = stage(pd.DataFrame({"doc_id": [1], "payload": [blob]}))
        assert out.iloc[0]["n_windows"] == 1
        assert out.iloc[0]["best_lag_sum"] == 12
        # r(12) for a perfect +-A period-12 wave over the overlap
        a = s.astype(np.int64)
        assert out.iloc[0]["r_max_total"] == int(
            (a[:-12] * a[12:]).sum())

    def test_tie_breaks_to_smallest_lag(self):
        import numpy as np
        import pandas as pd

        from ragflow_ray.ops.multimodal import AudioPitchStage
        from ragflow_ray.parsers.wavdec import encode_wav_pcm16

        # constant signal: every lag k has r(k) = A^2 * (256 - k),
        # strictly decreasing in k -> smallest lag wins outright; the
        # all-zero signal ties every lag at 0 -> argmax first = lag 8
        z = np.zeros(256, dtype=np.int16)
        stage = AudioPitchStage(window=256, lag_lo=8, lag_hi=32)
        out = stage(pd.DataFrame({
            "doc_id": [1],
            "payload": [encode_wav_pcm16(z, sample_rate=16000)]}))
        assert out.iloc[0]["best_lag_sum"] == 8
        assert out.iloc[0]["r_max_total"] == 0
