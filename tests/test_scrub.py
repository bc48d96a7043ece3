

def test_text_normalize_unicode(spark):
    from hail_spark.llmdata.scrub import text_normalize
    from pyspark.sql import functions as F

    rows = [
        (1, "a\u200bb\u00adc"),                      # zero-width/soft hyphen
        (2, "\u201chi\u201d \u2014 it\u2019s"),    # quotes/dash fold
        (3, "x\u0007y\t z\r\n w"),                 # control + ws collapse
        (4, "\u00a0 lead\u3000trail \u202f"),       # unicode spaces
        (5, "wait\u2026 what"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["t"] for r in
           df.select("id", text_normalize(F.col("text")).alias("t")).collect()}
    assert got[1] == "abc"
    assert got[2] == '"hi" - it\u0027s'.replace("\\u0027", "'")
    assert got[3] == "xy z w"
    assert got[4] == "lead trail"
    assert got[5] == "wait... what"
    assert got[6] is None or got[6] == ""


def test_text_normalize_matches_duckdb_oracle_on_unicode(spark):
    # the gate corpus is ASCII; pin the unicode rules against the
    # DuckDB replay used by the oracle so the two engines cannot drift
    import duckdb

    import __spark_entry__ as entry
    from hail_spark.llmdata.scrub import text_normalize
    from pyspark.sql import functions as F

    rows = [
        (1, "a\u200bb \u201cq\u201d \u2013 c\u2026  d\u00a0e"),
        (2, "\u2018x\u2019\u0008y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", text_normalize(F.col("text")).alias("t")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = entry.oracle_sql()["text_normalize_docs"].replace(
        "md5(t) AS norm_md5", "t AS norm_md5"
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
