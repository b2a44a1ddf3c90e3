"""Partitioning-independence: the stripes table is a pure function of the
LOGICAL input — reshuffling the same rows must produce byte-identical
stripes (this is what makes resume + speculative execution safe)."""

from pyspark.sql import functions as F

from orc_format_spark import pipeline, transcripts


def test_stripes_invariant_to_input_partitioning(spark):
    df = transcripts.generate(spark, n_convs=50, seed=21)
    df.cache().count()
    a = df.repartition(3)
    b = df.repartition(17, F.col("ts"))

    def digest(d):
        s = pipeline.encode_dataframe(d, "conv_id", "turn_idx",
                                      stripe_rows=400, n_buckets=7)
        return {(r["stripe_id"], r["col_name"]): (r["checksum"], r["h"])
                for r in s.withColumn("h", F.sha1(F.concat(
                    "present", "data", "length", "dict_data", "extra")))
                .select("stripe_id", "col_name", "checksum", "h").collect()}

    da, db = digest(a), digest(b)
    assert da == db
    assert len(da) > 10
