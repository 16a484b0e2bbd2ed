"""Python DataSource, file wrappers, HTTP URL builders, streaming."""

import os
import tempfile

from pyspark.sql import functions as F

from duckdb_sudan__spark.providers import api
from duckdb_sudan__spark.providers.http import (
    build_fao_url,
    build_ilo_urls,
    build_unhcr_url,
    build_who_url,
    build_worldbank_url,
)
from duckdb_sudan__spark.providers.pushdown import YearFilter
from duckdb_sudan__spark.sources import register_sudan_datasource
from duckdb_sudan__spark.sources.files import read_parquet, write_parquet
from duckdb_sudan__spark.streaming.events import run_stream_to_memory
from tests.conftest import SF_DIR


def test_datasource_worldbank_matches_api(spark):
    register_sudan_datasource(spark)
    ds = (
        spark.read.format("sudan")
        .option("provider", "worldbank")
        .option("indicator", "SP.POP.TOTL")
        .option("countries", "SDN,EGY")
        .load()
    )
    fn = api.sudan_worldbank(spark, "SP.POP.TOTL", ["SDN", "EGY"])
    assert ds.schema == fn.schema
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, fn.collect()))


def test_datasource_partitions_per_country(spark):
    register_sudan_datasource(spark)
    ds = (
        spark.read.format("sudan")
        .option("provider", "unhcr")
        .option("population_type", "idps")
        .option("countries", "SDN,EGY,ETH")
        .load()
    )
    # one input partition per country → 3 partitions before any shuffle
    assert ds.rdd.getNumPartitions() == 3


def test_datasource_year_pushdown(spark):
    register_sudan_datasource(spark)
    ds = (
        spark.read.format("sudan")
        .option("provider", "ilo")
        .option("indicator", "UNE_DEAP_SEX_AGE_RT")
        .option("year_start", "2015")
        .option("year_end", "2016")
        .load()
    )
    years = sorted(r[0] for r in ds.select("year").distinct().collect())
    assert years == [2015, 2016]


def test_http_url_builders():
    yf = YearFilter(2010, 2020)
    assert build_worldbank_url("SP.POP.TOTL", "SDN", yf) == (
        "https://api.worldbank.org/v2/country/SDN/indicator/SP.POP.TOTL"
        "?format=json&per_page=1000&page=1&date=2010:2020"
    )
    assert build_who_url("MDG_0000000026", "SDN", yf) == (
        "https://ghoapi.azureedge.net/api/MDG_0000000026"
        "?$filter=SpatialDim eq 'SDN' and TimeDim ge 2010 and TimeDim le 2020"
    )
    # FAO: numeric area code, hard limit=500, element is NOT a URL param
    # (filtered client-side, fao_functions.cpp:140-149)
    assert build_fao_url("QCL", "SDN") == (
        "https://faostatservices.fao.org/api/v1/en/data/QCL?area=276&output_type=objects&limit=500"
    )
    # UNHCR: unified population endpoint, cf_type=iso, coo/coa as the param
    assert build_unhcr_url("coo", "SDN", yf) == (
        "https://api.unhcr.org/population/v1/population/"
        "?limit=10000&cf_type=iso&coo=SDN&yearFrom=2010&yearTo=2020"
    )
    # ILO: DF_ guarded, REF_AREA-first key, wildcard suffix ladder
    ilo = build_ilo_urls("UNE_DEAP_SEX_AGE_RT", "SDN", yf)
    assert ilo[0] == (
        "https://sdmx.ilo.org/rest/data/ILO,DF_UNE_DEAP_SEX_AGE_RT/SDN.A."
        "?format=jsondata&detail=dataonly&lastNObservations=20&startPeriod=2010&endPeriod=2020"
    )
    assert len(ilo) == 5 and ilo[-1].split("?")[0].endswith("SDN.A.....")
    # DF_ prefix is not doubled for catalog IDs that already carry it
    assert build_ilo_urls("DF_UNE_2EAP_SEX_AGE_RT", "SDN", YearFilter())[0].startswith(
        "https://sdmx.ilo.org/rest/data/ILO,DF_UNE_2EAP_SEX_AGE_RT/"
    )


def test_file_roundtrip(spark):
    df = api.sudan_providers(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "providers_parquet")
        write_parquet(df, path)
        back = read_parquet(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_prune_stale_siblings_removes_same_basename_other_hash(tmp_path):
    """ADVICE r7 (medium): a sibling cache dir with the SAME basename
    but a different path hash (second checkout of the same dataset, or
    the old pre-hash layout) must be pruned at staging, else the
    static oracle glob matches both dirs and double-counts. Different
    basenames (other SFs) must survive."""
    import os

    from duckdb_sudan__spark.sources.files import _prune_stale_siblings, sf_cache_key

    root = str(tmp_path)
    sf_dir = str(tmp_path / "data" / "sf0.01")
    key = sf_cache_key(sf_dir)
    for name in (key, "sf0.01-deadbeef", "sf0.01", "sf0.1-cafe0123", f"{key}.staging-99"):
        os.makedirs(os.path.join(root, name, "csv"), exist_ok=True)
    _prune_stale_siblings(root, key)
    left = sorted(os.listdir(root))
    assert key in left                       # our own dir survives
    assert "sf0.01-deadbeef" not in left     # poisoned twin pruned
    assert "sf0.01" not in left              # legacy layout pruned
    assert "sf0.1-cafe0123" in left          # other SF untouched
    assert f"{key}.staging-99" in left       # in-flight staging untouched


def test_stream_tumbling_matches_batch(spark):
    """Streaming tumbling agg == batch ev_tumbling (no late data in a
    replayed static file, so watermark drops nothing)."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    stream_rows = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in run_stream_to_memory(spark, SF_DIR, "tumbling").collect()
    }
    batch_rows = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in QUERIES["ev_tumbling"](spark, SF_DIR).collect()
    }
    assert stream_rows == batch_rows


def test_stream_sessionize_runs(spark):
    df = run_stream_to_memory(spark, SF_DIR, "sessionize")
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.session_start <= r.session_end for r in rows)


def test_stream_funnel_matches_batch(spark):
    """The applyInPandasWithState funnel state machine must produce
    exactly the batch ev_funnel result (same first-completion
    semantics) when the stream drains the same static file."""
    from duckdb_sudan__spark.operators import QUERIES

    srows = {tuple(r) for r in QUERIES["stream_funnel"](spark, SF_DIR).collect()}
    brows = {tuple(r) for r in QUERIES["ev_funnel"](spark, SF_DIR).collect()}
    assert srows == brows
    assert len(srows) > 0


def test_stream_dedup_matches_distinct(spark, duck):
    """dropDuplicatesWithinWatermark over the drained file stream must
    keep exactly the distinct event_ids."""
    from duckdb_sudan__spark.operators import QUERIES

    n = QUERIES["stream_dedup"](spark, SF_DIR).count()
    exact = duck.sql("SELECT COUNT(DISTINCT event_id) FROM events").fetchone()[0]
    assert n == exact


def test_funnel_tws_matches_applyinpandas_and_batch(spark):
    """The transformWithStateInPandas funnel tier must be
    result-identical to the GroupState tier AND to the batch ev_funnel
    oracle query — same state machine, three execution strategies.
    Requires a google.protobuf runtime (the tier's JVM↔Python state
    channel) — the real wheel or the vendored shim, whichever
    ensure_protobuf_path resolved before the session's JVM started."""
    import pytest

    from duckdb_sudan__spark.vendor import ensure_protobuf_path

    if not ensure_protobuf_path():
        pytest.skip("no google.protobuf runtime and no vendored shim")
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    tws = {tuple(r) for r in run_stream_to_memory(spark, SF_DIR, "funnel_tws").collect()}
    legacy = {tuple(r) for r in run_stream_to_memory(spark, SF_DIR, "funnel").collect()}
    batch = {tuple(r) for r in QUERIES["ev_funnel"](spark, SF_DIR).select(
        "user_id", "view_ts", "click_ts", "purchase_ts", "funnel_micros").collect()}
    assert tws == legacy == batch
    assert len(tws) > 0


def test_weekly_streaks_tws_matches_applyinpandas_and_batch(spark):
    """r14 (VERDICT r13 item 6): the typed-state weekly-streak tier
    must be row-identical to the GroupState tier (same state machine,
    late_drops included), and its max(run_len)-per-user histogram must
    equal the batch ev_weekly_active_streaks exactly."""
    import pytest

    from pyspark.sql import functions as F

    from duckdb_sudan__spark.vendor import ensure_protobuf_path

    if not ensure_protobuf_path():
        pytest.skip("no google.protobuf runtime and no vendored shim")
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    tws_df = run_stream_to_memory(spark, SF_DIR, "weekly_streaks_tws")
    tws = {tuple(r) for r in tws_df.collect()}
    legacy = {tuple(r) for r in run_stream_to_memory(spark, SF_DIR, "weekly_streaks").collect()}
    assert tws == legacy and len(tws) > 0
    shist = {
        tuple(r)
        for r in tws_df.groupBy("user_id")
        .agg(F.max("run_len").cast("bigint").alias("longest_weeks"))
        .groupBy("longest_weeks")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .collect()
    }
    bhist = {tuple(r) for r in QUERIES["ev_weekly_active_streaks"](spark, SF_DIR).collect()}
    assert shist == bhist
    # ordered corpus → the in-band late counter reads zero here too
    assert tws_df.where(F.col("late_drops") != 0).count() == 0


def test_tws_gate_matches_protobuf_availability(spark):
    """The conditional registration is consistent: stream_funnel_tws is
    in QUERIES exactly when protobuf imports — never a half-registered
    tier."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.streaming import register as sr

    assert sr.TWS_REGISTERED == sr._tws_available()
    assert ("stream_funnel_tws" in QUERIES) == sr.TWS_REGISTERED


def test_tws_gate_registers_when_protobuf_present(monkeypatch):
    """Execute the registration branch itself (this container lacks
    protobuf, so without forcing the gate the branch would never run):
    with the availability probe forced true, the tier registers into
    QUERIES; the entry is removed again to keep the session honest."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.streaming import register as sr

    already = "stream_funnel_tws" in QUERIES
    monkeypatch.setattr(sr, "_tws_available", lambda: True)
    try:
        assert sr._register_tws_tier() is True
        assert "stream_funnel_tws" in QUERIES
        fn = QUERIES["stream_funnel_tws"]
        assert callable(fn)
    finally:
        if not already:
            QUERIES.pop("stream_funnel_tws", None)


def test_tws_plan_builds_without_protobuf(spark):
    """transformWithStateInPandas PLAN construction (processor class,
    output schema, state spec wiring) must not require the protobuf
    runtime — only execution does. Guards the tier's plumbing in this
    container even though the channel itself can't run here."""
    import pytest

    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming import events as ev

    e = load_table(spark, SF_DIR, "events")
    try:
        df = ev.funnel_tws_stream(ev.as_stream_shape(e) if hasattr(ev, "as_stream_shape") else e)
    except ImportError:
        pytest.skip("plan construction itself imports protobuf in this pyspark version")
    names = [f.name for f in df.schema]
    assert {"user_id", "view_ts", "click_ts", "purchase_ts", "funnel_micros"} <= set(names)


def test_merge_capabilities_probe_is_honest(spark):
    """Classpath probe reports both lakehouse runtimes absent in this
    container (neither jar ships here) — and never raises."""
    from duckdb_sudan__spark.streaming.sinks import merge_capabilities

    caps = merge_capabilities(spark)
    assert set(caps) == {"delta", "iceberg"}
    assert caps["delta"] is False and caps["iceberg"] is False


def test_merge_statement_pins_latest_wins_contract():
    """The MERGE text is the same latest-wins semantic the parquet
    stage-and-swap implements: keyed on user_id, (ts, event_id)
    tie-break, upsert-all columns."""
    from duckdb_sudan__spark.streaming.sinks import merge_statement

    sql = merge_statement("lake.latest_by_user", "updates")
    assert "MERGE INTO lake.latest_by_user t" in sql
    assert "USING updates s" in sql
    assert "ON t.user_id = s.user_id" in sql
    assert "s.ts > t.ts OR (s.ts = t.ts AND s.event_id > t.event_id)" in sql
    assert "UPDATE SET *" in sql and "INSERT *" in sql


def test_merge_foreach_batch_fails_loud_without_jars(spark):
    """Without either runtime the body must raise the documented
    guidance, not silently no-op or half-write."""
    import pytest

    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.sinks import merge_upsert_foreach_batch

    fn = merge_upsert_foreach_batch("lake.latest_by_user")
    batch = load_table(spark, SF_DIR, "events").limit(10)
    with pytest.raises(RuntimeError, match="Delta or Iceberg"):
        fn(batch, 0)


def test_merge_sink_end_to_end(spark):
    """Execution leg: runs only where a lakehouse runtime is on the
    classpath (skipped in this container). Drains the event stream
    through MERGE and checks latest-wins equivalence with the batch
    reduction."""
    import pytest

    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.sinks import (
        latest_per_user,
        merge_capabilities,
        merge_upsert_foreach_batch,
    )

    caps = merge_capabilities(spark)
    if not any(caps.values()):
        pytest.skip("no Delta/Iceberg runtime on the classpath")
    fmt = "delta" if caps["delta"] else "iceberg"
    spark.sql("CREATE TABLE IF NOT EXISTS _merge_target "
              "(user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE, event_id BIGINT) "
              f"USING {fmt}")
    try:
        events = load_table(spark, SF_DIR, "events")
        fn = merge_upsert_foreach_batch("_merge_target")
        fn(events, 0)
        got = {tuple(r) for r in spark.table("_merge_target").collect()}
        want = {tuple(r) for r in latest_per_user(
            events.select("user_id", "ts", "event_type", "value", "event_id")).collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS _merge_target")


def test_stream_attribution_matches_batch_interval_join(spark):
    """The stream-stream interval self-join, drained over the static
    file, must produce exactly the batch interval join's pair set."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.events import ATTRIBUTION_LAG_MIN
    from pyspark.sql import functions as F

    operators.load_all()
    srows = {tuple(r) for r in QUERIES["stream_attribution"](spark, SF_DIR).collect()}

    e = load_table(spark, SF_DIR, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    batch = (
        c.join(
            v,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("v_ts") <= F.col("c_ts"))
            & (F.col("v_ts") > F.col("c_ts") - F.expr(f"INTERVAL {ATTRIBUTION_LAG_MIN} MINUTES")),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "view_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_micros"),
        )
    )
    brows = {tuple(r) for r in batch.collect()}
    assert srows == brows
    assert len(srows) > 0


def test_stream_sink_upsert_matches_batch_latest_wins(spark):
    """The foreachBatch stage-and-swap upsert must end at exactly the
    batch latest-event-per-user table."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.sinks import latest_per_user

    got = {tuple(r) for r in QUERIES["stream_sink_upsert"](spark, SF_DIR).collect()}
    e = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_type", "value", "event_id")
    want = {tuple(r) for r in latest_per_user(e).collect()}
    assert got == want
    assert len(got) > 0


def test_stream_sink_partitioned_counts(spark, duck):
    """The partitioned streaming parquet sink must land every event,
    with per-type counts equal to the exact batch counts."""
    from duckdb_sudan__spark.operators import QUERIES

    got = {(r.event_type, r.n_events) for r in QUERIES["stream_sink_partitioned"](spark, SF_DIR).collect()}
    want = set(duck.sql("SELECT event_type, COUNT(*) FROM events GROUP BY event_type").fetchall())
    assert got == want


def test_upsert_sink_recovers_snapshot_after_crash_window():
    """If a batch dies between rename(target→old) and rename(staging→
    target), the next batch must restore the displaced snapshot instead
    of rebuilding from one micro-batch (ADVICE r2)."""
    from duckdb_sudan__spark.streaming.sinks import _recover_snapshot

    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "snap")
        # simulate the mid-swap crash: target missing, two generations of .old
        for bid, payload in [(3, "gen3"), (7, "gen7")]:
            d = target + f".old-{bid}"
            os.makedirs(d)
            with open(os.path.join(d, "data.txt"), "w") as f:
                f.write(payload)
        _recover_snapshot(target)
        assert os.path.isdir(target)
        assert open(os.path.join(target, "data.txt")).read() == "gen7"  # newest wins
        # idempotent: an existing target is never clobbered
        _recover_snapshot(target)
        assert open(os.path.join(target, "data.txt")).read() == "gen7"


def test_link_or_copy_falls_back_on_oserror(monkeypatch):
    """os.link raises EXDEV across filesystems — the helper must copy."""
    from duckdb_sudan__spark.streaming import sinks

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "a.bin")
        with open(src, "wb") as f:
            f.write(b"xyz")

        def boom(*a, **k):
            raise OSError(18, "Invalid cross-device link")

        monkeypatch.setattr(os, "link", boom)
        dst = os.path.join(tmp, "b.bin")
        sinks._link_or_copy(src, dst)
        assert open(dst, "rb").read() == b"xyz"


def test_stream_time_bucket_matches_batch_exactly(spark):
    """The 15-minute F.window stream is ROW-IDENTICAL (no rounding) to
    the batch ts_time_bucket operator: window boundaries are
    epoch-aligned like floor(epoch/900)·900 and both sides accumulate
    the value sum as DECIMAL(27,6), so even the double presentation is
    bit-equal."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    stream_rows = sorted(
        map(tuple, run_stream_to_memory(spark, SF_DIR, "time_bucket").collect())
    )
    batch_rows = sorted(map(tuple, QUERIES["ts_time_bucket"](spark, SF_DIR).collect()))
    assert stream_rows == batch_rows


def test_sessionize_tws_matches_batch_closed_sessions(spark):
    """The transformWithStateInPandas sessionizer must emit EXACTLY the
    batch gap-sessions that are closed by a later event of the same
    user (the emit-on-close contract: each user's final open session
    stays in state awaiting a watermark flush a bounded replay never
    reaches). Expected sessions are computed by an independent pandas
    reference — same (ts, event_id) order, same strict > gap rule, same
    integer-micros value accumulator — with each user's LAST session
    dropped."""
    import pandas as pd
    import pytest

    from duckdb_sudan__spark.vendor import ensure_protobuf_path

    if not ensure_protobuf_path():
        pytest.skip("no google.protobuf runtime and no vendored shim")

    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.events import SESSION_GAP_US

    got = {
        tuple(r)
        for r in run_stream_to_memory(spark, SF_DIR, "sessionize_tws").collect()
    }

    e = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"], kind="stable")
    )
    expect = set()
    for user_id, g in e.groupby("user_id"):
        us = g["ts"].astype("int64")
        us = us // 1000 if g["ts"].dtype.kind == "M" and g["ts"].dt.unit == "ns" else us
        vm = (g["value"].to_numpy() * 1e6).round().astype("int64")
        sessions = []
        cur = None
        for t_us, v in zip(us, vm):
            t_us = int(t_us)
            if cur is None:
                cur = [t_us, t_us, 1, int(v)]
            elif t_us - cur[1] > SESSION_GAP_US:
                sessions.append(cur)
                cur = [t_us, t_us, 1, int(v)]
            else:
                cur[1], cur[2], cur[3] = t_us, cur[2] + 1, cur[3] + int(v)
        # the open tail session is NOT emitted by the stream
        for s in sessions:
            expect.add(
                (
                    int(user_id),
                    pd.Timestamp(s[0], unit="us").to_pydatetime(),
                    pd.Timestamp(s[1], unit="us").to_pydatetime(),
                    s[2],
                    s[3],
                )
            )
    assert got == expect
    assert len(got) > 0


def test_stream_sudan_source_equals_batch(spark):
    """readStream.format("sudan") drained with availableNow must yield
    EXACTLY the batch table function's rows."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    got = sorted(tuple(r) for r in QUERIES["stream_sudan_worldbank"](spark, SF_DIR).collect())
    want = sorted(
        tuple(r) for r in api.sudan_worldbank(spark, "SP.POP.TOTL", ["SDN", "EGY", "ETH"]).collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_sudan_reader_incremental_offsets():
    """The year-indexed offset contract, unit-level: years_per_batch=1
    trickles one year per read(), offsets advance monotonically, the
    concatenation of every batch equals the full sample, and reads at
    the end return empty without moving the offset."""
    from duckdb_sudan__spark.sources.datasource import SudanStreamReader

    r = SudanStreamReader(
        {"provider": "worldbank", "indicator": "SP.POP.TOTL",
         "countries": "SDN,EGY", "years_per_batch": "1"}
    )
    full = SudanStreamReader(
        {"provider": "worldbank", "indicator": "SP.POP.TOTL", "countries": "SDN,EGY"}
    )
    all_rows, end = full.read(full.initialOffset())
    all_rows = sorted(all_rows)
    off = r.initialOffset()
    seen = []
    for _ in range(1000):
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows:
            assert nxt == off
            break
        years = {row[4] for row in rows}
        assert len(years) == 1, "years_per_batch=1 must emit one year per batch"
        assert nxt["y"] == off["y"] + 1
        seen.extend(rows)
        off = nxt
    assert sorted(seen) == all_rows


def test_stream_sudan_bind_error_at_plan_time(spark):
    """A bad provider must raise the reference's Bind error when the
    stream is planned — not as an executor-side failure."""
    import pytest

    register_sudan_datasource(spark)
    with pytest.raises(Exception, match="SUDAN"):
        q = (
            spark.readStream.format("sudan")
            .option("provider", "nope")
            .load()
            .writeStream.format("memory")
            .queryName("bad_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(30)
        q.stop()


def test_stream_sudan_checkpoint_resume(spark, tmp_path):
    """Checkpoint resumability of the streaming DataSource: three
    sequential availableNow runs against ONE checkpoint, one year per
    batch, must append years 1, 2, 3 of the sample in order with no
    duplicates — i.e. the committed offset survives query restarts."""
    register_sudan_datasource(spark)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    seen = []
    for _ in range(3):
        q = (
            spark.readStream.format("sudan")
            .option("provider", "worldbank")
            .option("indicator", "SP.POP.TOTL")
            .option("countries", "SDN")
            .option("years_per_batch", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()
        rows = spark.read.parquet(out).collect()
        years = sorted(r.year for r in rows)
        assert len(years) == len(set(years)), f"duplicate years after restart: {years}"
        seen.append(years)
    assert len(seen[0]) == 1 and len(seen[1]) == 2 and len(seen[2]) == 3
    assert seen[2][:1] == seen[0] and seen[2][:2] == seen[1]


def test_funnel_windowed_stream_matches_batch(spark):
    """The attribution-window funnel's streaming tier must be
    result-identical to the batch ev_funnel_windowed operator — same
    anchor-at-first-view window semantics, two execution strategies."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    stream = {
        tuple(r) for r in run_stream_to_memory(spark, SF_DIR, "funnel_windowed").collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["ev_funnel_windowed"](spark, SF_DIR)
        .select("user_id", "view_ts", "click_ts", "purchase_ts", "funnel_micros")
        .collect()
    }
    assert stream == batch
    assert len(stream) > 0


def test_stream_attribution_outer_matches_batch_left_outer(spark):
    """r6 verdict item 6: the LEFT-OUTER interval join drained over the
    static file must equal the batch left-outer join — including every
    unmatched view emitted exactly once with NULL click after the
    (sentinel-advanced) watermark passes its no-match horizon. The
    sentinels themselves must never appear."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.events import ATTRIBUTION_LAG_MIN
    from pyspark.sql import functions as F

    operators.load_all()
    srows = {tuple(r) for r in QUERIES["stream_attribution_outer"](spark, SF_DIR).collect()}
    assert not any(r[0] == -1 for r in srows), "sentinel leaked into output"

    e = load_table(spark, SF_DIR, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    batch = (
        v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") < F.col("v_ts") + F.expr(f"INTERVAL {ATTRIBUTION_LAG_MIN} MINUTES")),
            "left",
        )
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_micros"),
            F.col("click_id").isNotNull().alias("matched"),
        )
    )
    brows = {tuple(r) for r in batch.collect()}
    assert any(not r[4] for r in brows), "fixture should contain unmatched views"
    assert srows == brows


def test_stream_scd2_matches_batch_closed_versions(spark):
    """The streaming SCD2 builder, drained over the static file, must
    emit exactly the batch ev_scd2_intervals rows whose valid_to is
    set (open versions live in state, not output)."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    srows = {tuple(r) for r in QUERIES["stream_scd2"](spark, SF_DIR).collect()}
    batch = QUERIES["ev_scd2_intervals"](spark, SF_DIR)
    brows = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to)
        for r in batch.collect()
        if r.valid_to is not None
    }
    assert brows, "fixture should contain closed versions"
    assert srows == brows


def test_stream_hll_rollup_matches_batch_exactly(spark):
    """The drained streaming HLL rollup must equal a batch
    approx_count_distinct over the same hourly windows BIT-EXACTLY:
    register updates are max-merges, so micro-batch arrival order
    cannot change the estimate — and both estimates stay within 5% of
    the exact per-window distinct count."""
    from pyspark.sql import functions as F

    from duckdb_sudan__spark.session import load_table
    from duckdb_sudan__spark.streaming.events import run_stream_to_memory

    stream_rows = {
        (r.window_start, r.event_type): (r.approx_users, r.n_events)
        for r in run_stream_to_memory(spark, SF_DIR, "hll_rollup").collect()
    }
    e = load_table(spark, SF_DIR, "events")
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "approx_users", "n_events")
    )
    batch_rows = {
        (r.window_start, r.event_type): (r.approx_users, r.n_events)
        for r in batch.collect()
    }
    assert stream_rows == batch_rows
    exact = {
        (r.window_start, r.event_type): r.exact_users
        for r in e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .select(F.col("win.start").alias("window_start"), "event_type", "exact_users")
        .collect()
    }
    for k, (approx, _) in stream_rows.items():
        assert abs(approx - exact[k]) <= max(1, 0.05 * exact[k]), (k, approx, exact[k])


def test_stream_dedup_incremental_matches_batch(spark):
    """The drained ingestion-dedup stream must emit EXACTLY the batch
    dedup_incremental pairs: per-batch index commits make batch N see
    corpus + batches 1..N-1, so the union of per-batch pair sets is
    the full shard-touching pair set (on the real corpus the subsalt
    guard is inactive on both paths — the equality regime)."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    got = sorted(map(tuple, QUERIES["stream_dedup_incremental"](spark, SF_DIR).collect()))
    want = sorted(map(tuple, QUERIES["dedup_incremental"](spark, SF_DIR).collect()))
    assert got == want
    assert len(got) > 0


def test_incremental_index_commit_is_atomic_and_replay_safe(spark, tmp_path):
    """The crash-window contract of the streaming index update:
    an UNCOMMITTED delta dir (crash between delta write and manifest
    swap) is invisible to readers; replaying the same batch_id
    clobbers the orphan, emits identical pairs, and commits exactly
    once; a duplicate replay after commit is idempotent."""
    import os

    from duckdb_sudan__spark.operators import dedup

    # corpus: 9 unique docs + shard: two docs duplicating corpus docs
    base = [
        (i, f"corpus document number {i} " + " ".join(f"w{i}-{j}" for j in range(30)),
         "en", "syn", 200)
        for i in range(1, 10)  # doc_id % 10 != 0 → corpus split
    ]
    dup_of_1 = (10, base[0][1], "en", "syn", 200)
    dup_of_2 = (20, base[1][1], "en", "syn", 200)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(base + [dup_of_1, dup_of_2], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")

    index_dir = dedup.build_minhash_index(spark, str(tmp_path), out_dir=f"{tmp_path}/index")
    pairs_dir = f"{tmp_path}/pairs"
    fn = dedup.incremental_dedup_foreach_batch(index_dir, pairs_dir)

    def n_indexed():
        sigs, _ = dedup.read_minhash_index(spark, index_dir)
        return sigs.count()

    assert n_indexed() == 9

    batch0 = spark.createDataFrame([dup_of_1], schema)
    fn(batch0, 0)
    assert dedup._read_index_manifest(index_dir) == ["delta-00000"]
    assert n_indexed() == 10
    p0 = sorted(map(tuple, spark.read.parquet(f"{pairs_dir}/batch-00000").collect()))
    assert [(a, b) for a, b, _ in p0] == [(1, 10)]

    # simulated crash: batch 1's delta dir exists but was never committed
    orphan = os.path.join(index_dir, "delta-00001")
    os.makedirs(os.path.join(orphan, "sigs.parquet"))
    with open(os.path.join(orphan, "sigs.parquet", "junk"), "w") as f:
        f.write("crashed mid-write")
    assert n_indexed() == 10  # invisible: manifest still lists one delta

    # checkpoint replay of batch 1: orphan clobbered, pairs emitted, committed
    batch1 = spark.createDataFrame([dup_of_2], schema)
    fn(batch1, 1)
    assert dedup._read_index_manifest(index_dir) == ["delta-00000", "delta-00001"]
    assert n_indexed() == 11
    p1 = sorted(map(tuple, spark.read.parquet(f"{pairs_dir}/batch-00001").collect()))
    assert [(a, b) for a, b, _ in p1] == [(2, 20)]

    # duplicate replay after commit: idempotent, no manifest dup, same pairs
    fn(batch1, 1)
    assert dedup._read_index_manifest(index_dir) == ["delta-00000", "delta-00001"]
    assert n_indexed() == 11
    assert sorted(map(tuple, spark.read.parquet(f"{pairs_dir}/batch-00001").collect())) == p1


def test_stream_topk_trending_matches_batch(spark):
    """The drained trending top-3 per hour must equal the batch
    recompute (same tumbling boundaries, same (n DESC, type) tiebreak)
    — the stream adds incremental state, never different answers."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table

    operators.load_all()
    stream_rows = sorted(
        map(tuple, QUERIES["stream_topk_trending"](spark, SF_DIR).collect())
    )
    e = load_table(spark, SF_DIR, "events")
    counts = (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n_events"), "event_type")
    batch = (
        counts.select(
            "window_start", "event_type", "n_events",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= 3)
    )
    batch_rows = sorted(map(tuple, batch.collect()))
    assert stream_rows == batch_rows


def test_stream_quality_gate_matches_batch(spark):
    """The streaming classifier gate is a stateless map, so the
    drained stream must equal the batch relation EXACTLY — same rows,
    same scores, same keep bits."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    got = sorted(map(tuple, QUERIES["stream_quality_gate"](spark, SF_DIR).collect()))
    want = sorted(map(tuple, QUERIES["text_quality_classifier"](spark, SF_DIR).collect()))
    assert got == want


def test_stream_event_gaps_matches_batch_lag(spark):
    """The stateful per-key LAG stream (CDC delta shape) must
    aggregate EXACTLY to the batch ev_inter_event_gaps relation —
    same (ts, event_id) total order, same microsecond gaps — and
    emit one row per non-first event of each (user, type) key."""
    from pyspark.sql import functions as F

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    drained = QUERIES["stream_event_gaps"](spark, SF_DIR)
    sagg = {
        tuple(r)
        for r in drained.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        )
        .collect()
    }
    bagg = {tuple(r) for r in QUERIES["ev_inter_event_gaps"](spark, SF_DIR).collect()}
    assert sagg == bagg
    assert len(sagg) > 0
    # emit-per-event contract: every gap row names a real event and
    # gaps are non-negative (total order respected)
    assert drained.where(F.col("gap_us") < 0).count() == 0


def test_stream_bitmap_distinct_equals_exact_counts(spark):
    """The mergeable-bitmap streaming rollup must be EXACT: drained
    popcounts equal count(distinct user_id) per (hour, type) computed
    directly — the whole point of the bitmap tier over the HLL twin
    (bit_or merges are order-insensitive AND lossless)."""
    from pyspark.sql import functions as F

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table

    operators.load_all()
    drained = QUERIES["stream_bitmap_distinct"](spark, SF_DIR)
    got = {
        (r.window_start, r.event_type): r.distinct_users for r in drained.collect()
    }
    e = load_table(spark, SF_DIR, "events")
    want = {
        (r.window_start, r.event_type): r.n
        for r in e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_new_vs_returning_matches_batch(spark):
    """The per-user first-seen classification stream must aggregate
    EXACTLY to the batch ev_new_vs_returning daily counts, and emit
    exactly ONE is_new=true row per user (the first-ever day)."""
    from pyspark.sql import functions as F

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    drained = QUERIES["stream_new_vs_returning"](spark, SF_DIR)
    sagg = {
        tuple(r)
        for r in drained.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.count_if(F.col("is_new")).cast("bigint").alias("n_new"),
            F.count_if(~F.col("is_new")).cast("bigint").alias("n_returning"),
        )
        .collect()
    }
    bagg = {tuple(r) for r in QUERIES["ev_new_vs_returning"](spark, SF_DIR).collect()}
    assert sagg == bagg
    assert len(sagg) > 0
    # exactly one new-day row per user; (user, day) rows are unique
    per_user = drained.groupBy("user_id").agg(
        F.count_if(F.col("is_new")).alias("n_new_rows")
    )
    assert per_user.where(F.col("n_new_rows") != 1).count() == 0
    assert drained.groupBy("user_id", "day").count().where(F.col("count") > 1).count() == 0


def test_stream_event_gaps_pre_epoch_timestamps(spark, tmp_path):
    """Negative epoch-microsecond timestamps must flow through the
    stateful-lag stream exactly like the batch window — the 'has
    previous' flag comes from state.exists, never from a -1 sentinel
    a pre-1970 timestamp would collide with (review r9)."""
    import duckdb

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()

    # run_stream_to_memory hard-links sf_dir/events.parquet as ONE file
    # (the testdata layout), so write the fixture as a single file
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1::BIGINT, TIMESTAMP '1969-12-31 23:00:00', 7::BIGINT, 'view', 1.0, '{{}}'),
            (2::BIGINT, TIMESTAMP '1969-12-31 23:30:00', 7::BIGINT, 'view', 1.0, '{{}}'),
            (3::BIGINT, TIMESTAMP '1970-01-01 00:15:00', 7::BIGINT, 'view', 1.0, '{{}}'),
            (4::BIGINT, TIMESTAMP '1969-12-31 22:00:00', 8::BIGINT, 'click', 1.0, '{{}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{tmp_path}/events.parquet' (FORMAT parquet)
        """
    )
    con.close()

    drained = QUERIES["stream_event_gaps"](spark, str(tmp_path))
    got = sorted((r.user_id, r.event_id, r.gap_us) for r in drained.collect())
    # user 7: gaps 2->1 (30 min) and 3->2 (45 min); user 8: no gap
    assert got == [(7, 2, 30 * 60 * 1000000), (7, 3, 45 * 60 * 1000000)], got


def test_gaps_fn_drops_late_cross_batch_arrival():
    """The cross-batch ordering contract (r9 advice): an event arriving
    in a LATER micro-batch with a (ts, event_id) BEHIND the stored
    state is dropped explicitly — no silently-negative gap is emitted
    and the state never moves backwards — because its true predecessor
    already left the O(1) state. Drives _gaps_fn directly with a fake
    GroupState across two batches."""
    import pandas as pd

    from duckdb_sudan__spark.streaming.events import _gaps_fn

    class FakeState:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def batch(rows):
        eids, tss = zip(*rows)
        return pd.DataFrame(
            {"event_id": list(eids), "ts": pd.to_datetime(list(tss))}
        )

    st = FakeState()
    key = (7, "view")
    got1 = list(_gaps_fn(key, iter([batch(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:30:00")]
    )]), st))
    assert [int(g) for g in got1[0]["gap_us"]] == [30 * 60 * 1000000]
    # batch 2: eid 3 is LATE (10:15 < state's 10:30) → dropped;
    # eid 4 (11:00) gaps against the UNMOVED state (10:30), not eid 3
    got2 = list(_gaps_fn(key, iter([batch(
        [(3, "2024-01-01 10:15:00"), (4, "2024-01-01 11:00:00")]
    )]), st))
    out2 = got2[0]
    assert [int(e) for e in out2["event_id"]] == [4], out2
    assert [int(g) for g in out2["gap_us"]] == [30 * 60 * 1000000], out2
    assert st.get[0] == pd.Timestamp("2024-01-01 11:00:00").value // 1000
    assert st.get[1] == 4
    # batch 3: at-least-once RE-DELIVERY of the exact last event must
    # also drop (<=, not <) — no spurious gap_us=0 duplicate row
    got3 = list(_gaps_fn(key, iter([batch([(4, "2024-01-01 11:00:00")])]), st))
    assert got3 == [], got3
    assert st.get[1] == 4  # state unchanged


def test_snapshot_time_travel_isolation(spark):
    """Snapshot semantics: v1 still serves file B's rows AFTER v2's
    commit removed it (snapshot isolation), v2 serves the append minus
    the delete, and the shared file A is read by BOTH manifests
    without data copying (one physical file on disk)."""
    import json
    import os

    from duckdb_sudan__spark import operators  # noqa: F401
    from duckdb_sudan__spark.sources.files import (
        _snapshot_write,
        read_snapshot,
    )

    operators.load_all()
    root = _snapshot_write(spark, SF_DIR)
    v1 = read_snapshot(spark, root, 1)
    v2 = read_snapshot(spark, root, 2)
    # deleted-in-v2 rows (doc_id%4!=3 and %10==0) visible only in v1
    delpred = "doc_id % 4 != 3 AND doc_id % 10 = 0"
    assert v1.where(delpred).count() > 0
    assert v2.where(delpred).count() == 0
    # appended-in-v2 rows (doc_id%4==3) visible only in v2
    assert v1.where("doc_id % 4 = 3").count() == 0
    assert v2.where("doc_id % 4 = 3").count() > 0
    # both manifests reference the SAME file_A path — no data copy
    ms = [json.load(open(os.path.join(root, f"manifest_v{v}.json"))) for v in (1, 2)]
    assert "file_A" in ms[0]["files"] and "file_A" in ms[1]["files"]


def test_weekly_streak_fn_counts_late_drops():
    """ADVICE r13: _weekly_streak_fn's cross-batch drop of a week at-
    or-before the high-water mark was SILENT — now every emitted row
    carries the user's cumulative late_drops counter. Driven directly:
    a true out-of-order week increments it, a benign redelivery of the
    high-water week does not, and the counter survives batches that
    emit nothing."""
    import pandas as pd

    from duckdb_sudan__spark.streaming.events import _weekly_streak_fn

    class FakeState:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def batch(tss):
        return pd.DataFrame({"ts": pd.to_datetime(tss)})

    st = FakeState()
    key = (5,)
    # weeks 2820 and 2821 (epoch-day div 7): two emissions, no drops
    out1 = list(_weekly_streak_fn(key, iter([batch(
        ["2024-01-23 08:00:00", "2024-01-30 09:00:00"]
    )]), st))[0]
    assert [int(x) for x in out1["run_len"]] == [1, 2]
    assert [int(x) for x in out1["late_drops"]] == [0, 0]
    # batch 2: one LATE week (2819 < high-water 2821) and one new week
    # (2822) — the emission carries late_drops=1
    out2 = list(_weekly_streak_fn(key, iter([batch(
        ["2024-01-16 10:00:00", "2024-02-06 10:00:00"]
    )]), st))[0]
    assert [int(x) for x in out2["run_len"]] == [3]
    assert [int(x) for x in out2["late_drops"]] == [1]
    # batch 3: redelivery of the high-water week only — no emission,
    # no counter bump (== is benign, < is late)
    out3 = list(_weekly_streak_fn(key, iter([batch(["2024-02-06 11:00:00"])]), st))
    assert out3 == []
    assert st.get == (2822, 3, 1)
    # batch 4: another late week, emission-free — counter persists in
    # state and surfaces on the NEXT emission
    out4 = list(_weekly_streak_fn(key, iter([batch(["2024-01-02 10:00:00"])]), st))
    assert out4 == [] and st.get == (2822, 3, 2)
    out5 = list(_weekly_streak_fn(key, iter([batch(["2024-02-13 10:00:00"])]), st))[0]
    assert [int(x) for x in out5["run_len"]] == [4]
    assert [int(x) for x in out5["late_drops"]] == [2]


def test_new_ret_fn_drops_late_and_duplicate_days():
    """_new_ret_fn's cross-batch contract, driven directly: a later
    batch re-delivering an already-emitted day (or carrying an
    EARLIER day) is dropped via the high-water mark; the first-ever
    day is the only is_new=true emission; state never regresses."""
    import pandas as pd

    from duckdb_sudan__spark.streaming.events import _new_ret_fn

    class FakeState:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def batch(tss):
        return pd.DataFrame({"ts": pd.to_datetime(tss)})

    st_ = FakeState()
    key = (9,)
    out1 = list(_new_ret_fn(key, iter([batch(
        ["2024-01-02 08:00:00", "2024-01-02 09:00:00", "2024-01-03 10:00:00"]
    )]), st_))[0]
    assert [(str(d.date()), bool(n)) for d, n in zip(out1["day"], out1["is_new"])] == [
        ("2024-01-02", True), ("2024-01-03", False)
    ]
    # batch 2: duplicate day 03 (re-delivery) + LATE day 01 → both drop;
    # new day 04 emits returning
    got2 = list(_new_ret_fn(key, iter([batch(
        ["2024-01-03 23:00:00", "2024-01-01 05:00:00", "2024-01-04 01:00:00"]
    )]), st_))
    out2 = got2[0]
    assert [(str(d.date()), bool(n)) for d, n in zip(out2["day"], out2["is_new"])] == [
        ("2024-01-04", False)
    ]
    first_us, last_us = st_.get
    assert first_us == pd.Timestamp("2024-01-02").value // 1000
    assert last_us == pd.Timestamp("2024-01-04").value // 1000


def test_stream_hazard_lifetimes_equals_batch(spark):
    """The update-mode lifetime tracker drained and rolled up must
    reproduce the batch hazard table EXACTLY — min/max state is
    order-free, so this equivalence has no arrival-order caveat."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()

    got = [tuple(r) for r in QUERIES["stream_hazard_lifetimes"](spark, SF_DIR).collect()]
    want = [tuple(r) for r in QUERIES["ev_hazard_curve"](spark, SF_DIR).collect()]
    assert got == want and len(got) > 0


def test_stream_growth_accounting_matches_batch(spark):
    """The per-user weekly growth classification stream must aggregate
    EXACTLY to the batch ev_growth_accounting weekly rows (including
    the sink-side churned/quick-ratio presentation), emit exactly ONE
    'new' row per user, and never emit duplicate (user, week) rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    drained = QUERIES["stream_growth_accounting"](spark, SF_DIR)
    states = drained.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("active"),
        F.count_if(F.col("status") == "new").cast("bigint").alias("new_users"),
        F.count_if(F.col("status") == "retained").cast("bigint").alias("retained"),
        F.count_if(F.col("status") == "resurrected").cast("bigint").alias("resurrected"),
    )
    wgrid = Window.orderBy("week")
    sagg = {
        tuple(r)
        for r in states.select(
            "week", "active", "new_users", "retained", "resurrected",
            (F.coalesce(F.lag("active").over(wgrid), F.lit(0)) - F.col("retained"))
            .cast("bigint")
            .alias("churned"),
        )
        .selectExpr(
            "*",
            "CASE WHEN churned > 0"
            " THEN CAST(1000000 * (new_users + resurrected) div churned AS BIGINT)"
            " END AS quick_ratio_ppm",
        )
        .collect()
    }
    bagg = {tuple(r) for r in QUERIES["ev_growth_accounting"](spark, SF_DIR).collect()}
    assert sagg == bagg
    assert len(sagg) > 0
    per_user = drained.groupBy("user_id").agg(
        F.count_if(F.col("status") == "new").alias("n_new_rows")
    )
    assert per_user.where(F.col("n_new_rows") != 1).count() == 0
    assert drained.groupBy("user_id", "week").count().where(F.col("count") > 1).count() == 0


def test_stream_interval_union_matches_batch_closed_islands(spark):
    """Drained CLOSED islands must equal the batch merge-intervals
    sweep minus each user's final (still-open-at-drain) island, with
    exact starts/ends/event counts; the window constant must match
    the batch entry's."""
    import duckdb

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.olap30 import COVER_WINDOW_US
    from duckdb_sudan__spark.streaming.events import IVU_WINDOW_US

    assert IVU_WINDOW_US == COVER_WINDOW_US
    operators.load_all()
    drained = QUERIES["stream_interval_union"](spark, SF_DIR)
    got = {
        (r["user_id"], r["island_start"], r["island_end"], r["n_events"])
        for r in drained.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    batch = con.execute(f"""
    WITH iv AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
             CAST(epoch_us(ts) AS BIGINT) + {COVER_WINDOW_US} AS e
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    ), merged AS (
      SELECT user_id, island_id, MIN(s) AS start_us, MAX(e) AS end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(island_id) OVER (PARTITION BY user_id) AS last_island
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id, start_us, end_us, n_events
    FROM merged WHERE island_id < last_island
    """).fetchall()
    import datetime

    def us_ts(us):
        return datetime.datetime.utcfromtimestamp(us / 1_000_000).replace(
            microsecond=int(us % 1_000_000)
        )

    want = {(u, us_ts(s), us_ts(e), n) for u, s, e, n in batch}
    assert got == want
    assert len(got) > 0


def test_stream_basket_pairs_matches_batch(spark):
    """The incremental basket maintenance stream, drained over a
    4-file split (orders deliberately span micro-batches), must sum to
    the batch q_market_basket_pairs pair counts EXACTLY — every
    distinct (order, pair) emitted once regardless of which batch
    contributed which brand."""
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    got = {
        (r.brand_a, r.brand_b): r.n_ab
        for r in QUERIES["stream_basket_pairs"](spark, SF_DIR).collect()
    }
    want = {
        (r.brand_a, r.brand_b): r.n_ab
        for r in QUERIES["q_market_basket_pairs"](spark, SF_DIR).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_stream_weekly_streaks_matches_batch(spark):
    """The per-user streak stream (r13): max(run_len) per user over the
    drained rows, histogrammed, must equal the batch
    ev_weekly_active_streaks exactly; per-user rows are unique per week
    and run lengths within a user are internally consistent (a run of
    length L is preceded by L-1 at the prior week)."""
    from pyspark.sql import functions as F

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    drained = QUERIES["stream_weekly_streaks"](spark, SF_DIR)
    shist = {
        tuple(r)
        for r in drained.groupBy("user_id")
        .agg(F.max("run_len").cast("bigint").alias("longest_weeks"))
        .groupBy("longest_weeks")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .collect()
    }
    bhist = {tuple(r) for r in QUERIES["ev_weekly_active_streaks"](spark, SF_DIR).collect()}
    assert shist == bhist and len(shist) > 0
    # ADVICE r13: the late-drop counter must be in-band AND zero here —
    # the corpus replays per-user week-ordered, so any nonzero counter
    # means the ordering contract (the premise of batch-equivalence)
    # broke somewhere between source and state
    assert drained.where(F.col("late_drops") != 0).count() == 0
    # (user, wk) rows unique
    assert drained.groupBy("user_id", "wk").count().where(F.col("count") > 1).count() == 0
    # internal consistency: every run_len L > 1 at week w has L-1 at w-1
    a = drained.select("user_id", "wk", "run_len").where(F.col("run_len") > 1)
    b = drained.select(
        F.col("user_id").alias("u2"), F.col("wk").alias("w2"), F.col("run_len").alias("r2")
    )
    bad = a.join(
        b,
        (a.user_id == b.u2) & (b.w2 == a.wk - 1) & (b.r2 == a.run_len - 1),
        "left_anti",
    )
    assert bad.count() == 0


def test_bucketed_stage_redeclare_is_nondestructive(spark):
    """r13 review: a fresh session (empty in-memory catalog) with a
    matching marker+data must RE-DECLARE the external bucketed tables
    over the existing files — never rmtree a location another session
    may be mid-scan on. Simulated by dropping the catalog entries
    (external tables: data survives) and re-staging: the data files'
    inodes/mtimes must be untouched, and the re-declared tables must
    keep the zero-exchange bucketed plan."""
    import os

    from duckdb_sudan__spark.sources.files import _bucketed_stage

    t_o, t_c = _bucketed_stage(spark, SF_DIR)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    loc = os.path.join(root, "tmp", "bucketed", t_o)
    before = {
        f: os.stat(os.path.join(loc, f)).st_mtime_ns
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    }
    assert before, "external location should hold bucketed parquet files"
    spark.sql(f"DROP TABLE {t_o}")
    spark.sql(f"DROP TABLE {t_c}")
    assert os.path.isdir(loc), "external table drop must leave the data"
    t_o2, t_c2 = _bucketed_stage(spark, SF_DIR)
    assert (t_o2, t_c2) == (t_o, t_c)
    after = {
        f: os.stat(os.path.join(loc, f)).st_mtime_ns
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    }
    assert after == before, "re-declare must not rewrite the data files"
    # the re-declared tables still carry the bucket spec: the joined
    # plan shows two bucketed scans and no pre-join Exchange
    o = spark.table(t_o2)
    c = spark.table(t_c2)
    j = o.hint("merge").join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Bucketed: true") == 2, plan
