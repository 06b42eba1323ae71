"""Round-3 contract tests for the verdict/advice fixes.

Covers: simhash pigeonhole recall (verdict #3), ngram length-band
boundary recall (verdict #9), tier-parameterized codec framing
(verdict #6), neardup prefilter default + dim inference (verdict #4),
minhash per-invocation signature isolation (advice #1), IVF lowest-cid
tie-break (advice #2), one-sided monthwise whiskers on degenerate
months (advice #4), and the single-scan LSH plan shape (verdict #5).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _plan(df) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution \
        .ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


class TestSimhashRecallContract:
    def _plant(self, spark, max_hamming: int, n_base: int = 20):
        """Base signatures plus, for each, a partner at EXACTLY
        max_hamming distance with the flipped bits spread across
        distinct chunk positions — the adversarial layout the round-2
        fixed-4-chunk blocking dropped."""
        rng = np.random.default_rng(7)
        sigs = {}
        expected = set()
        for i in range(n_base):
            base = int(rng.integers(0, 1 << 64, dtype=np.uint64))
            sigs[i] = base
            # spread flips evenly so no two land in the same chunk of
            # a (max_hamming+1)-chunk split
            flipped = base
            step = 64 // max(max_hamming, 1)
            for d in range(max_hamming):
                flipped ^= 1 << (d * step)
            sigs[1000 + i] = flipped
            expected.add((i, 1000 + i))
        df = spark.createDataFrame(
            [(k, _signed64(v)) for k, v in sigs.items()],
            "doc_id long, simhash long")
        return df, expected

    @pytest.mark.parametrize("max_hamming", [1, 3, 6, 8])
    def test_all_planted_pairs_recovered(self, spark, max_hamming):
        from tstoken.textops import simhash_pairs_from_sigs
        df, expected = self._plant(spark, max_hamming)
        out = simhash_pairs_from_sigs(df, max_hamming=max_hamming) \
            .toPandas()
        got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
        missing = expected - got
        assert not missing, f"pigeonhole recall broken: {missing}"
        assert (out["hamming"] <= max_hamming).all()

    def test_distance_above_bound_excluded(self, spark):
        from tstoken.textops import simhash_pairs_from_sigs
        # distance 4 pair with bound 3 must not be returned
        base = 0x0123456789ABCDEF
        far = base ^ ((1 << 0) | (1 << 17) | (1 << 34) | (1 << 51))
        df = spark.createDataFrame(
            [(1, _signed64(base)), (2, _signed64(far))],
            "doc_id long, simhash long")
        out = simhash_pairs_from_sigs(df, max_hamming=3).toPandas()
        assert len(out) == 0

    def test_default_bound_is_three(self):
        import inspect

        from tstoken.textops import simhash_dup_pairs
        sig = inspect.signature(simhash_dup_pairs)
        assert sig.parameters["max_hamming"].default == 3


class TestNgramJaccardBoundary:
    def test_band_boundary_pair_found(self, spark):
        from tstoken.textops import ngram_jaccard_pairs
        # lengths 14 and 16 straddle the grid-0 cell edge at 16; the
        # half-offset grid-1 cell (14+8)//16 == (16+8)//16 == 1 saves
        # the pair (round-2 single-grid blocking dropped it)
        docs = spark.createDataFrame(
            [(1, "hello world aa", "s1"),
             (2, "hello world aaaa", "s1")],
            "doc_id long, text string, source string")
        out = ngram_jaccard_pairs(docs, threshold=0.4,
                                  length_band=16).toPandas()
        got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
        assert (1, 2) in got
        # hit by both grids -> must still appear exactly once
        assert len(out) == len(out.drop_duplicates(["doc_a", "doc_b"]))

    def test_guarantee_half_band_distance(self, spark):
        """Any pair with |len_a - len_b| <= band/2 shares a cell in at
        least one grid: sweep all lengths around several boundaries."""
        from tstoken.textops import ngram_jaccard_pairs
        rows = []
        did = 0
        expected = set()
        # texts of 3..10 three-char words (lengths 11,15,...,39) with a
        # partner whose last word is extended by 1..8 chars: lengths
        # sweep every residue around the 16-char cell boundaries, word
        # overlap stays (cnt-1)/(cnt+1) >= 0.5
        for cnt in range(3, 11):
            base = " ".join(f"w{i:02d}" for i in range(cnt))
            for delta in range(1, 9):  # band 16 -> guarantee <= 8
                rows.append((did, base, f"s{did}"))
                rows.append((did + 1, base + "x" * delta, f"s{did}"))
                expected.add((did, did + 1))
                did += 2
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = ngram_jaccard_pairs(docs, threshold=0.45,
                                  length_band=16).toPandas()
        got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
        missing = expected - got
        assert not missing, f"boundary pairs dropped: {sorted(missing)}"


class TestCompressTierFraming:
    @pytest.mark.parametrize("tier,step", [("1h", 3600), ("1d", 86400)])
    def test_roundtrip_and_block_shape(self, spark, tier, step):
        from tstoken import compress
        n = 600
        ts = pd.date_range("2024-01-01", periods=n, freq=f"{step}s")
        vals = np.sin(np.arange(n) / 9.0) * 50 + 100
        pdf = pd.DataFrame({"source": "sA", "bucket_ts": ts,
                            "sum_n_tok": vals})
        rollup = spark.createDataFrame(pdf)
        blocks = compress.compress_tier(rollup, tier=tier,
                                        points_per_chunk=4096)
        bl = blocks.toPandas()
        # 600 points at 4096-points-per-chunk framing: 1 or 2 blocks
        # (chunk grid is epoch-aligned, a series may straddle one
        # boundary) — the round-2 60s framing gave ~9 (1h) / ~200 (1d)
        assert len(bl) <= 2, f"{tier} framing produced {len(bl)} blocks"
        dec = compress.decompress_blocks(blocks).toPandas() \
            .sort_values("bucket_ts").reset_index(drop=True)
        assert len(dec) == n
        np.testing.assert_allclose(dec["value"].to_numpy(), vals)
        assert (dec["bucket_ts"].to_numpy()
                == ts.to_numpy()).all()


class TestNeardupDefaults:
    def test_default_plan_has_no_nested_loop_join(self, spark):
        from tstoken.simsearch import cosine_neardup_pairs
        rng = np.random.default_rng(3)
        emb = spark.createDataFrame(
            [(i, rng.standard_normal(16).tolist()) for i in range(40)],
            "vec_id long, embedding array<double>")
        plan = _plan(cosine_neardup_pairs(emb, threshold=0.5))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_exact_optin_uses_nested_loop(self, spark):
        from tstoken.simsearch import cosine_neardup_pairs
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(5)],
            "vec_id long, embedding array<double>")
        plan = _plan(cosine_neardup_pairs(emb, threshold=0.5,
                                          prefilter_planes=0))
        assert ("BroadcastNestedLoopJoin" in plan
                or "CartesianProduct" in plan)

    def test_empty_corpus_returns_empty_not_crash(self, spark):
        # review fix: the default prefilter path used to raise
        # ValueError at plan-build on an empty/all-null corpus where
        # the old exact default returned an empty frame
        from tstoken.simsearch import cosine_neardup_pairs
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
        out = cosine_neardup_pairs(empty, threshold=0.5)
        assert out.count() == 0
        assert set(out.columns) == {"id_a", "id_b", "cosine"}

    def test_null_first_row_does_not_break_dim_inference(self, spark):
        from tstoken.simsearch import infer_dim
        emb = spark.createDataFrame(
            [(0, None), (1, [0.1, 0.2, 0.3])],
            "vec_id long, embedding array<double>")
        assert infer_dim(emb) == 3

    def test_empty_array_first_row_still_finds_pairs(self, spark):
        # review fix round 2: a zero-LENGTH (not null) first embedding
        # made _infer_dim_or_none return None and silently drop every
        # genuine pair in the rest of the corpus
        from tstoken.simsearch import cosine_neardup_pairs, infer_dim
        emb = spark.createDataFrame(
            [(0, []), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
            "vec_id long, embedding array<double>")
        assert infer_dim(emb) == 2
        out = cosine_neardup_pairs(emb, threshold=0.5).toPandas()
        assert {(r.id_a, r.id_b) for r in out.itertuples()} == {(1, 2)}

    def test_dim_inference_matches_explicit(self, spark):
        from tstoken.simsearch import cosine_neardup_pairs, infer_dim
        rng = np.random.default_rng(9)
        base = rng.standard_normal((25, 12))
        vecs = np.vstack([base, base[:4] + 1e-3])
        emb = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(len(vecs))],
            "vec_id long, embedding array<double>")
        assert infer_dim(emb) == 12
        inferred = cosine_neardup_pairs(emb, threshold=0.95).toPandas()
        explicit = cosine_neardup_pairs(emb, threshold=0.95,
                                        dim=12).toPandas()
        key = ["id_a", "id_b"]
        assert (set(map(tuple, inferred[key].to_numpy()))
                == set(map(tuple, explicit[key].to_numpy())))

    def test_wrong_dim_would_degenerate_but_inference_avoids_it(
            self, spark):
        """Regression guard for the silent-quadratic failure: a
        mismatched dim gives null plane dots -> signature 0 -> one
        bucket. Inference must keep signatures diverse."""
        from tstoken.simsearch import _multi_table_sigs
        rng = np.random.default_rng(1)
        emb = spark.createDataFrame(
            [(i, rng.standard_normal(16).tolist()) for i in range(30)],
            "id_a long, va array<double>")
        good = _multi_table_sigs(emb, "va", ["id_a"], 16, 8, 2)
        n_sigs = good.select("lsh_sig").distinct().count()
        assert n_sigs > 2  # diverse buckets, not one giant bucket
        bad = _multi_table_sigs(emb, "va", ["id_a"], 64, 8, 2)
        n_bad = bad.select("lsh_sig").distinct().count()
        assert n_bad == 1  # documents WHY inference matters


class TestLshPlanShape:
    def test_single_corpus_scan(self, spark):
        """lsh_topk must compute all table signatures in one corpus
        projection: the number of scan nodes in the plan must not grow
        with n_tables (round-2 plan showed Scan x32 for 8 tables)."""
        from tstoken.simsearch import lsh_topk
        rng = np.random.default_rng(2)
        emb = spark.createDataFrame(
            [(i, rng.standard_normal(16).tolist()) for i in range(50)],
            "vec_id long, embedding array<double>")
        q = spark.createDataFrame(
            [(100 + i, rng.standard_normal(16).tolist())
             for i in range(3)],
            "qid long, qvec array<double>")
        plan = _plan(lsh_topk(emb, q, dim=16, k=3, n_planes=6,
                              n_tables=8))
        scans = plan.count("Scan ExistingRDD")
        assert scans <= 4, f"plan re-scans inputs: {scans} scans"

    def test_lsh_recall_against_exact(self, spark):
        from tstoken.simsearch import cosine_topk, lsh_topk
        rng = np.random.default_rng(4)
        base = rng.standard_normal((80, 16))
        emb = spark.createDataFrame(
            [(i, base[i].tolist()) for i in range(80)],
            "vec_id long, embedding array<double>")
        # queries = jittered copies of corpus vectors -> top-1 known
        q = spark.createDataFrame(
            [(100 + i, (base[i] + rng.normal(0, 0.01, 16)).tolist())
             for i in range(5)],
            "qid long, qvec array<double>")
        got = lsh_topk(emb, q, dim=16, k=1, n_planes=4,
                       n_tables=8).toPandas()
        hits = sum(1 for _, r in got.iterrows()
                   if r["vec_id"] == r["qid"] - 100)
        assert hits >= 4


class TestMinhashSigIsolation:
    def test_two_live_results_do_not_clobber(self, spark):
        """The round-2 shared default sig_table let call 2 overwrite
        call 1's lazily-read signatures; per-invocation names keep both
        results correct when collected AFTER both calls are built."""
        from tstoken.textops import minhash_dup_pairs
        d1 = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog", "s"),
             (2, "the quick brown fox jumps over the lazy cat", "s"),
             (3, "unrelated text entirely different words", "s")],
            "doc_id long, text string, source string")
        d2 = spark.createDataFrame(
            [(7, "alpha beta gamma delta epsilon zeta eta", "s"),
             (8, "alpha beta gamma delta epsilon zeta theta", "s")],
            "doc_id long, text string, source string")
        r1 = minhash_dup_pairs(d1, threshold=0.4)
        r2 = minhash_dup_pairs(d2, threshold=0.4)  # builds + writes sigs
        p2 = r2.toPandas()
        p1 = r1.toPandas()  # collected after r2 materialized its table
        got1 = set(map(tuple, p1[["doc_a", "doc_b"]].to_numpy()))
        got2 = set(map(tuple, p2[["doc_a", "doc_b"]].to_numpy()))
        assert (1, 2) in got1 and all(d < 4 for p in got1 for d in p)
        assert (7, 8) in got2


class TestIvfTieBreak:
    def test_duplicate_vector_assigns_lowest_cid(self, spark):
        from tstoken.simsearch import ivf_assign
        # two identical centroids -> exact similarity tie; the oracle
        # (ORDER BY s DESC, i ASC) picks cid 0, so must the engine
        cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
        df = spark.createDataFrame(
            [(1, [2.0, 0.0]), (2, [0.5, 0.0])],
            "vec_id long, embedding array<double>")
        out = ivf_assign(df, "embedding", cents).toPandas()
        assert (out["ivf_cluster"] == 0).all()


class TestMonthwiseDegenerateWhiskers:
    def test_spark_and_pandas_agree_on_degenerate_month(self, spark):
        """A single-point month and a constant month: IQR = 0, fences
        collapse to the point; one-sided whiskers must equal that value
        on BOTH surfaces (the old two-sided pandas mask could emit NaN
        where Spark emitted a value)."""
        from tstoken.compat import build_monthwise_stats
        from tstoken.diagnostics import monthwise_box
        rows = [("2024-01-15", 5.0), ("2024-02-01", 3.0),
                ("2024-02-02", 3.0), ("2024-02-03", 3.0),
                ("2024-03-01", 1.0), ("2024-03-02", 2.0),
                ("2024-03-03", 4.0), ("2024-03-04", 100.0)]
        pdf = pd.DataFrame(rows, columns=["d", "n"])
        sdf = spark.createDataFrame(pdf) \
            .select(F.lit("s").alias("source"),
                    F.to_timestamp("d").alias("bucket_ts"),
                    F.col("n").alias("n_events"))
        sp = monthwise_box(sdf).toPandas().sort_values("month") \
            .reset_index(drop=True)
        pdres = build_monthwise_stats(pdf).sort_values("Month-Year") \
            .reset_index(drop=True)
        for col in ("n", "vmin", "vmax", "q1", "median", "q3",
                    "whisker_lo", "whisker_hi", "n_fliers"):
            np.testing.assert_allclose(
                sp[col].astype(float).to_numpy(),
                pdres[col].astype(float).to_numpy(),
                err_msg=f"column {col} disagrees")
        # degenerate months concretely: no NaN whiskers anywhere here
        assert sp["whisker_lo"].notna().all()
        assert pdres["whisker_lo"].notna().all()
