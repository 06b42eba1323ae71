"""Spark-side engine tests: synth exactness, rollup-vs-oracle equality,
tier cascade, gap-fill, salting invariance, detector F1, codec
round-trip through Spark, retention (SURVEY.md §5 engine test plan)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstoken import detect, gapfill, rollup, synth

ROWS = 12_000
SOURCES = 4


@pytest.fixture(scope="module")
def raw(spark):
    df = synth.generate_tokens_raw(spark, ROWS, n_sources=SOURCES).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def oracle_pdf():
    return synth.generate_tokens_raw_pandas(ROWS, n_sources=SOURCES)


@pytest.fixture(scope="module")
def t1m(spark, raw):
    df = rollup.rollup_1m(raw).cache()
    df.count()
    yield df
    df.unpersist()


def oracle_rollup_1m(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["step"] = pdf["source"].str[4:7].astype(int).map(lambda i: 3 + (i * 7) % 43)
    pdf["minute"] = (pdf["seq"] * pdf["step"]) // 60
    pdf["bucket_ts"] = (pd.Timestamp("2024-01-01")
                        + pd.to_timedelta(pdf["minute"] * 60, unit="s"))
    pdf["tok_sq"] = pdf["tokens"].map(
        lambda a: int((a.astype(np.int64) ** 2).sum()))
    return (pdf.groupby(["source", "bucket_ts"])
            .agg(n_docs=("n_tok", "size"), sum_n_tok=("n_tok", "sum"),
                 min_n_tok=("n_tok", "min"), max_n_tok=("n_tok", "max"),
                 sum_tok_sq=("tok_sq", "sum"))
            .reset_index()
            .sort_values(["source", "bucket_ts"]).reset_index(drop=True))


class TestSynth:
    def test_row_identity_vs_pandas_oracle(self, raw, oracle_pdf):
        sdf = raw.select("doc_id", "n_tok").toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        odf = oracle_pdf[["doc_id", "n_tok"]] \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(sdf) == len(odf)
        assert (sdf["doc_id"] == odf["doc_id"]).all()
        assert (sdf["n_tok"].astype(int) == odf["n_tok"].astype(int)).all()

    def test_token_array_equality(self, raw, oracle_pdf):
        # per-row token-array invariant (BASELINE input_hint)
        samp = raw.select("doc_id", "tokens").limit(300).toPandas()
        om = oracle_pdf.set_index("doc_id")
        for _, row in samp.iterrows():
            assert np.array_equal(np.array(row["tokens"]),
                                  om.loc[row["doc_id"], "tokens"])

    def test_zipf_skew(self, raw):
        counts = raw.groupBy("source").count().toPandas() \
            .set_index("source")["count"]
        assert counts["src-000"] > 0.3 * counts.sum()  # hot key exists

    def test_ground_truth_table(self, spark):
        gt = synth.ground_truth(spark, ROWS, n_sources=SOURCES).toPandas()
        assert set(gt["kind"]) <= {"spike", "drop"}
        assert len(gt) > 0

    def test_seeded_regime_matches_pandas_oracle(self, spark):
        # the regime knobs (held-out F1 harness) must keep the Spark
        # generator and the NumPy oracle row-identical, not just the
        # defaults — both mixes fold the seed offset congruently
        kw = dict(seed=3, anomaly_period=100, spike_mult=5.0,
                  drop_mult=0.2, zipf_exp=1.6)
        sdf = synth.generate_tokens_raw(spark, 8000, n_sources=SOURCES,
                                        **kw) \
            .select("doc_id", "n_tok").toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        odf = synth.generate_tokens_raw_pandas(8000, n_sources=SOURCES,
                                               **kw) \
            [["doc_id", "n_tok"]].sort_values("doc_id") \
            .reset_index(drop=True)
        assert len(sdf) == len(odf)
        assert (sdf["doc_id"] == odf["doc_id"]).all()
        assert (sdf["n_tok"].astype(int) == odf["n_tok"].astype(int)).all()
        # and a seeded table differs from the seed-0 one (the knob bites)
        base = synth.generate_tokens_raw_pandas(8000, n_sources=SOURCES)
        assert not odf["doc_id"].equals(
            base[["doc_id"]].sort_values("doc_id")
            .reset_index(drop=True)["doc_id"]) or \
            not odf["n_tok"].reset_index(drop=True).equals(
                base.sort_values("doc_id")["n_tok"].astype(odf["n_tok"].dtype)
                .reset_index(drop=True))


class TestRollup:
    def test_1m_exact_vs_oracle(self, t1m, oracle_pdf):
        r = t1m.toPandas().sort_values(["source", "bucket_ts"]) \
            .reset_index(drop=True)
        g = oracle_rollup_1m(oracle_pdf)
        assert len(r) == len(g)
        r["bucket_ts"] = pd.to_datetime(r["bucket_ts"])
        for c in ["n_docs", "sum_n_tok", "min_n_tok", "max_n_tok",
                  "sum_tok_sq"]:
            assert (r[c].to_numpy() == g[c].to_numpy()).all(), c
        assert (r["bucket_ts"].to_numpy() == g["bucket_ts"].to_numpy()).all()

    def test_salting_invariance(self, raw, t1m):
        # two-phase salted agg must be exact for any salt count
        alt = rollup.rollup_1m(raw, n_salts=1).toPandas() \
            .sort_values(["source", "bucket_ts"]).reset_index(drop=True)
        ref = t1m.toPandas().sort_values(["source", "bucket_ts"]) \
            .reset_index(drop=True)
        for c in ["n_docs", "sum_n_tok", "min_n_tok", "max_n_tok",
                  "sum_tok_sq"]:
            assert (alt[c].to_numpy() == ref[c].to_numpy()).all(), c

    def test_cascade_preserves_totals(self, t1m):
        t1h = rollup.rollup_cascade(t1m, "1h")
        t1d = rollup.rollup_cascade(t1h, "1d")
        a = t1m.agg(F.sum("n_docs"), F.sum("sum_n_tok"),
                    F.sum("sum_tok_sq")).collect()[0]
        for tier in (t1h, t1d):
            b = tier.agg(F.sum("n_docs"), F.sum("sum_n_tok"),
                         F.sum("sum_tok_sq")).collect()[0]
            assert tuple(a) == tuple(b)
        # min/max consistency
        m1 = t1m.agg(F.min("min_n_tok"), F.max("max_n_tok")).collect()[0]
        m2 = t1d.agg(F.min("min_n_tok"), F.max("max_n_tok")).collect()[0]
        assert tuple(m1) == tuple(m2)

    def test_bucket_uniqueness(self, t1m):
        dup = (t1m.groupBy("source", "bucket_ts").count()
               .filter("count > 1").count())
        assert dup == 0


class TestGapFill:
    def test_dense_axis(self, t1m):
        gf = gapfill.gap_fill(t1m, "1m").toPandas()
        for src, grp in gf.groupby("source"):
            ts = pd.to_datetime(grp["bucket_ts"]).sort_values()
            deltas = ts.diff().dropna().dt.total_seconds()
            assert (deltas == 60).all(), src
        filled = gf[gf["gap_filled"]]
        assert len(filled) > 0  # synth plants 1% gap minutes
        assert (filled["n_docs"] == 0).all()
        assert filled["min_n_tok"].isna().all()

    def test_original_rows_untouched(self, t1m):
        gf = gapfill.gap_fill(t1m, "1m")
        a = gf.filter(~F.col("gap_filled")).agg(
            F.sum("sum_n_tok"), F.count(F.lit(1))).collect()[0]
        b = t1m.agg(F.sum("sum_n_tok"), F.count(F.lit(1))).collect()[0]
        assert tuple(a) == tuple(b)


class TestDetectors:
    @pytest.fixture(scope="class")
    def gf(self, spark, t1m):
        df = gapfill.gap_fill(t1m, "1m").cache()
        df.count()
        yield df
        df.unpersist()

    def test_iqr_matches_numpy(self, gf):
        fl = detect.iqr_flags(gf).toPandas()
        vals = gf.select("source", "bucket_ts", "sum_n_tok").toPandas()
        merged = fl.merge(vals, on=["source", "bucket_ts"])
        from tstoken.stats.dispersion import iqr_labels
        for src, grp in merged.groupby("source"):
            expect = iqr_labels(grp["sum_n_tok"].to_numpy(float))
            assert (grp["is_outlier"].to_numpy() == expect).all(), src

    def test_mad_matches_numpy(self, gf):
        fl = detect.mad_flags(gf).toPandas()
        vals = gf.select("source", "bucket_ts", "sum_n_tok").toPandas()
        merged = fl.merge(vals, on=["source", "bucket_ts"])
        from tstoken.stats.dispersion import mad_labels
        for src, grp in merged.groupby("source"):
            expect = mad_labels(grp["sum_n_tok"].to_numpy(float))
            assert (grp["is_outlier"].to_numpy() == expect).all(), src

    def test_stl_f1_vs_ground_truth(self, spark, gf):
        fl = detect.grouped_flags(gf, "1m", "stl").toPandas()
        gt = synth.ground_truth(spark, ROWS, n_sources=SOURCES).toPandas()
        gt["bucket_ts"] = pd.to_datetime(gt["bucket_ts"])
        fl["bucket_ts"] = pd.to_datetime(fl["bucket_ts"])
        truth = set(zip(gt["source"], gt["bucket_ts"]))
        flagged = set(zip(fl.loc[fl["is_outlier"], "source"],
                          fl.loc[fl["is_outlier"], "bucket_ts"]))
        # truth minutes that actually exist in the rolled data
        have = set(zip(fl["source"], fl["bucket_ts"]))
        truth &= have
        tp = len(truth & flagged)
        prec = tp / max(len(flagged), 1)
        rec = tp / max(len(truth), 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        # |z|>2 flags ~2-3% of ANY Gaussian series (reference semantics,
        # catch.py:1156) so precision is bounded on short series; assert
        # the planted anomalies are mostly recovered and F1 is sane
        assert rec >= 0.6, (prec, rec, f1)
        assert f1 > 0.25, (prec, rec, f1)


class TestCompressSpark:
    def test_roundtrip_through_spark(self, spark, t1m):
        from tstoken import compress
        blocks = compress.compress_tier(t1m)
        dec = compress.decompress_blocks(blocks).toPandas() \
            .sort_values(["source", "bucket_ts"]).reset_index(drop=True)
        ref = t1m.selectExpr("source", "bucket_ts",
                             "cast(sum_n_tok as double) as value") \
            .toPandas().sort_values(["source", "bucket_ts"]) \
            .reset_index(drop=True)
        assert len(dec) == len(ref)
        assert (dec["value"].to_numpy() == ref["value"].to_numpy()).all()
        assert (pd.to_datetime(dec["bucket_ts"]).to_numpy()
                == pd.to_datetime(ref["bucket_ts"]).to_numpy()).all()

    def test_compression_ratio(self, t1m):
        from tstoken import compress
        blocks = compress.compress_tier(t1m).toPandas()
        raw_bytes = 16 * blocks["n_points"].sum()
        enc_bytes = (blocks["ts_block"].map(len).sum()
                     + blocks["val_block"].map(len).sum())
        assert enc_bytes < raw_bytes * 0.7

    def test_foreign_codec_tag_refused(self, spark, t1m):
        # wire format v2 ("gorilla+dod2", 64-bit first delta): a block
        # tagged with another codec must refuse, not silently
        # mis-decode (the 64-bit read would eat old 32-bit fields)
        import pyspark.sql.utils as U

        import pytest

        from tstoken import compress
        stale = compress.compress_tier(t1m) \
            .withColumn("codec", F.lit("gorilla+dod"))
        with pytest.raises((U.PythonException, Exception),
                           match="gorilla"):
            compress.decompress_blocks(stale).count()

    @staticmethod
    def _encode_timestamps_v1(ts):
        # genuine round-2 "gorilla+dod" writer (32-bit first delta,
        # flag-less '1111'+32b escape) so the migration tests decode
        # real v1 bytes, not relabeled v2 ones
        import numpy as np
        from tstoken.compress import _BitWriter
        ts = np.asarray(ts, dtype=np.int64)
        w = _BitWriter()
        n = ts.shape[0]
        w.write(n, 32)
        if n == 0:
            return w.getvalue()
        w.write(int(ts[0]) & ((1 << 64) - 1), 64)
        if n == 1:
            return w.getvalue()
        w.write(int(ts[1] - ts[0]) & ((1 << 32) - 1), 32)
        for d in np.diff(np.diff(ts)):
            d = int(d)
            if d == 0:
                w.write(0, 1)
            elif -63 <= d <= 64:
                w.write(0b10, 2)
                w.write(d + 63, 7)
            elif -255 <= d <= 256:
                w.write(0b110, 3)
                w.write(d + 255, 9)
            elif -2047 <= d <= 2048:
                w.write(0b1110, 4)
                w.write(d + 2047, 12)
            else:
                w.write(0b1111, 4)
                w.write(d & ((1 << 32) - 1), 32)
        return w.getvalue()

    def _v1_blocks(self, spark):
        import numpy as np
        from tstoken import compress
        ts = np.array([1_700_000_000 + 60 * i for i in range(500)]
                      + [1_700_100_000 + 3600 * i for i in range(100)],
                      dtype=np.int64)
        vals = np.sin(np.arange(ts.size) * 0.37) * 100 + 7.0
        row = {
            "source": "legacy", "chunk": 0,
            "ts_block": self._encode_timestamps_v1(ts),
            "val_block": compress.encode_values(vals),
            "n_points": int(ts.size), "codec": compress.CODEC_V1,
        }
        return (spark.createDataFrame([row], schema=compress.BLOCK_SCHEMA),
                ts, vals)

    def test_v1_migrate_flag_decodes_legacy_blocks(self, spark):
        import numpy as np
        import pytest
        from tstoken import compress
        v1, ts, vals = self._v1_blocks(spark)
        # default path still refuses — migration is opt-in only
        with pytest.raises(Exception, match="migrate_v1"):
            compress.decompress_blocks(v1).count()
        dec = compress.decompress_blocks(v1, migrate_v1=True).toPandas() \
            .sort_values("bucket_ts").reset_index(drop=True)
        got_ts = (pd.to_datetime(dec["bucket_ts"]).astype("int64")
                  // 10 ** 9).to_numpy()
        assert (got_ts == ts).all()
        assert (dec["value"].to_numpy() == vals).all()

    def test_recompress_v1_blocks_upgrades_in_place(self, spark, t1m):
        import pytest
        from tstoken import compress
        v1, ts, vals = self._v1_blocks(spark)
        v2 = compress.compress_tier(t1m)
        mixed = v2.unionByName(v1)
        migrated = compress.recompress_v1_blocks(mixed)
        tags = [r.codec for r in migrated.select("codec").distinct().collect()]
        assert tags == [compress.CODEC]
        # already-v2 rows pass through byte-identical
        orig = {(r.source, r.chunk): (bytes(r.ts_block), bytes(r.val_block))
                for r in v2.collect()}
        for r in migrated.collect():
            if r.source != "legacy":
                assert (bytes(r.ts_block), bytes(r.val_block)) \
                    == orig[(r.source, r.chunk)]
        # and the migrated legacy block decodes under the DEFAULT path
        dec = compress.decompress_blocks(
            migrated.filter("source = 'legacy'")).toPandas() \
            .sort_values("bucket_ts").reset_index(drop=True)
        got_ts = (pd.to_datetime(dec["bucket_ts"]).astype("int64")
                  // 10 ** 9).to_numpy()
        assert (got_ts == ts).all()
        assert (dec["value"].to_numpy() == vals).all()
        # unknown tags still refuse even through the migration job
        bad = v1.withColumn("codec", F.lit("zstd"))
        with pytest.raises(Exception, match="unknown"):
            compress.recompress_v1_blocks(bad).count()


class TestRetention:
    def test_read_side_filter(self, spark, t1m):
        from datetime import datetime, timedelta
        from tstoken.retention import filter_retained
        hi = t1m.agg(F.max("bucket_ts")).collect()[0][0]
        now = hi + timedelta(days=1)
        kept = filter_retained(t1m, "1m", now,
                               horizons={"1m": timedelta(hours=6)})
        lo_allowed = now - timedelta(hours=6)
        assert kept.filter(F.col("bucket_ts") < F.lit(lo_allowed)).count() == 0
        assert kept.count() < t1m.count()


class TestEngineDetectorVariants:
    @pytest.fixture(scope="class")
    def gf(self, spark, t1m):
        df = gapfill.gap_fill(t1m, "1m").cache()
        df.count()
        yield df
        df.unpersist()

    def test_stl_z_flags_planted_anomalies(self, spark, gf):
        fl = detect.grouped_flags(gf, "1m", "stl_z").toPandas()
        assert set(fl["method"]) == {"stl_z"}
        gt = synth.ground_truth(spark, ROWS, n_sources=SOURCES).toPandas()
        have = set(zip(fl["source"], pd.to_datetime(fl["bucket_ts"])))
        truth = set(zip(gt["source"], pd.to_datetime(gt["bucket_ts"]))) & have
        flagged = set(zip(fl.loc[fl.is_outlier, "source"],
                          pd.to_datetime(fl.loc[fl.is_outlier, "bucket_ts"])))
        rec = len(truth & flagged) / max(len(truth), 1)
        assert rec >= 0.6, rec

    def test_stl_mad_runs_and_flags_subset_shape(self, spark, gf):
        fl = detect.grouped_flags(gf, "1m", "stl_mad").toPandas()
        assert len(fl) == gf.count()
        assert fl["is_outlier"].dtype == bool

    def test_stationarity_check_runs_per_source(self, spark, t1m):
        st = detect.stationarity_check(t1m).toPandas()
        assert len(st) == SOURCES
        assert set(st.columns) >= {"source", "adf_stat", "adf_stationary",
                                   "kpss_stat", "kpss_stationary"}


class TestRound2Fixes:
    """Round-2 verdict/advice fixes: empty-token docs in rollup_1m,
    visible detector fallback, unknown-method validation."""

    def test_rollup_counts_empty_and_null_token_docs(self, spark):
        # rollup_1m is the public ingest for arbitrary tokens_raw
        # tables: docs with [] or NULL tokens must still count toward
        # n_docs (pre-fix they silently vanished from the posexplode)
        rows = [("d-0", [3, 4], 2, "src-000"),
                ("d-1", [], 0, "src-000"),
                ("d-2", None, 0, "src-000")]
        raw = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string")
        out = rollup.rollup_1m(raw).toPandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["n_docs"] == 3
        assert r["sum_n_tok"] == 2
        assert r["min_n_tok"] == 0 and r["max_n_tok"] == 2
        assert r["sum_tok_sq"] == 9 + 16

    @pytest.fixture(scope="class")
    def const_series(self, spark):
        from datetime import datetime, timedelta
        rows = [("src-000", datetime(2024, 1, 1) + timedelta(minutes=i),
                 7) for i in range(200)]
        return spark.createDataFrame(
            rows, "source string, bucket_ts timestamp, sum_n_tok long")

    def test_degenerate_kernel_fallback_is_labeled(self, const_series):
        # constant series -> degenerate STL decomposition -> IQR
        # fallback, which must SAY SO in the method column instead of
        # shipping flags labeled "stl" (round-1 verdict #3)
        fl = detect.grouped_flags(const_series, "1m", "stl").toPandas()
        assert set(fl["method"]) == {"iqr_fallback"}
        assert not fl["is_outlier"].any()

    def test_short_series_fallback_is_labeled(self, spark):
        from datetime import datetime, timedelta
        rows = [("src-000", datetime(2024, 1, 1) + timedelta(minutes=i),
                 float(i % 5)) for i in range(10)]
        df = spark.createDataFrame(
            rows, "source string, bucket_ts timestamp, sum_n_tok double")
        fl = detect.grouped_flags(df, "1m", "mstl").toPandas()
        assert set(fl["method"]) == {"iqr_fallback"}

    def test_explicit_iqr_is_not_labeled_fallback(self, const_series):
        fl = detect.grouped_flags(const_series, "1m", "iqr").toPandas()
        assert set(fl["method"]) == {"iqr"}

    def test_unknown_method_raises_at_build_time(self, const_series):
        with pytest.raises(ValueError, match="unknown method"):
            detect.grouped_flags(const_series, "1m", "nope")

    def test_extrema_ensemble_catches_sparse_dip_and_spike(self, spark):
        # one source, stable per-doc token level ~1000, one spiked
        # bucket (all docs x8) and one dipped bucket (x1/8); both have
        # few docs, where the mean-ratio MAD alone misses dips
        from datetime import datetime, timedelta

        import numpy as np
        rng = np.random.default_rng(9)
        rows = []
        base = datetime(2024, 1, 1)
        for i in range(300):
            n_docs = int(rng.integers(1, 4))
            per_doc = rng.integers(900, 1100, n_docs)
            if i == 100:
                per_doc = per_doc * 8        # spike
            elif i == 200:
                per_doc = per_doc // 8       # dip
            rows.append(("src-000", base + timedelta(minutes=i),
                         int(n_docs), int(per_doc.sum()),
                         int(per_doc.min()), int(per_doc.max()),
                         0, False))
        t1m = spark.createDataFrame(
            rows, "source string, bucket_ts timestamp, n_docs long, "
                  "sum_n_tok long, min_n_tok int, max_n_tok int, "
                  "sum_tok_sq long, gap_filled boolean")
        fl = detect.extrema_ensemble_flags(t1m).toPandas() \
            .sort_values("bucket_ts").reset_index(drop=True)
        assert len(fl) == 300
        assert set(fl["method"]) == {"extrema_ensemble"}
        assert bool(fl.iloc[100]["is_outlier"])   # spike caught
        assert bool(fl.iloc[200]["is_outlier"])   # dip caught
        assert int(fl["is_outlier"].sum()) <= 6   # few false alarms
