"""Config-system tests (reference src/config.rs semantics: layered
toml + local overrides + INPUTLAYER_* env with `__` nesting,
deny-unknown-fields, type validation)."""

import json
import urllib.error
import urllib.request

import pytest

from inputlayer_spark.config import Config, ConfigError


def test_defaults():
    cfg = Config.load(config_dir="/nonexistent", env={})
    assert cfg.storage.data_dir == "data"
    assert cfg.storage.persistence.format == "parquet"
    assert cfg.http.port == 8080
    assert cfg.optimization.enable_magic_sets is True


def test_toml_then_local_override(tmp_path):
    (tmp_path / "config.toml").write_text(
        '[storage]\ndata_dir = "/var/kg"\n'
        '[storage.persistence]\nformat = "csv"\ncompression = "gzip"\n'
        "[http]\nport = 9000\n"
    )
    (tmp_path / "config.local.toml").write_text("[http]\nport = 9001\n")
    cfg = Config.load(config_dir=str(tmp_path), env={})
    assert cfg.storage.data_dir == "/var/kg"
    assert cfg.storage.persistence.format == "csv"
    assert cfg.http.port == 9001  # local file wins over config.toml


def test_env_overrides_files(tmp_path):
    (tmp_path / "config.toml").write_text('[storage]\ndata_dir = "/from/toml"\n')
    cfg = Config.load(
        config_dir=str(tmp_path),
        env={
            "INPUTLAYER_STORAGE__DATA_DIR": "/from/env",
            "INPUTLAYER_STORAGE__PERSISTENCE__FORMAT": "json",
            "INPUTLAYER_HTTP__AUTH__SESSION_TIMEOUT_SECS": "60",
            "INPUTLAYER_HTTP__ENABLED": "false",
            "UNRELATED_VAR": "ignored",
        },
    )
    assert cfg.storage.data_dir == "/from/env"
    assert cfg.storage.persistence.format == "json"
    assert cfg.http.auth.session_timeout_secs == 60  # coerced to int
    assert cfg.http.enabled is False  # coerced to bool


def test_unknown_keys_rejected(tmp_path):
    (tmp_path / "config.toml").write_text("[storage]\nnot_a_field = 1\n")
    with pytest.raises(ConfigError, match="unknown config key"):
        Config.load(config_dir=str(tmp_path), env={})
    with pytest.raises(ConfigError, match="unknown config key"):
        Config.load(config_dir="/nonexistent", env={"INPUTLAYER_NOPE__X": "1"})


def test_type_mismatch_rejected(tmp_path):
    (tmp_path / "config.toml").write_text("[http]\nport = \"not-a-port\"\n")
    with pytest.raises(ConfigError, match="expected int"):
        Config.load(config_dir=str(tmp_path), env={})


def test_from_file(tmp_path):
    p = tmp_path / "custom.toml"
    p.write_text('[logging]\nlevel = "error"\n')
    cfg = Config.from_file(str(p), env={})
    assert cfg.logging.level == "error"


def test_server_main_config_wiring(spark, tmp_path):
    """`server.main --config` binds host/port/auth/data_dir; drive a
    request through the configured instance."""
    import json
    import threading
    import urllib.request

    from inputlayer_spark import server as server_mod

    creds = tmp_path / "creds.json"
    (tmp_path / "config.toml").write_text(
        f'[storage]\ndata_dir = "{tmp_path}/kgdata"\n'
        "[http]\nport = 0\n"
        f'[http.auth]\ncredentials_file = "{creds}"\n'
        'bootstrap_admin_password = "hunter22"\n'
    )
    from inputlayer_spark.auth import AuthStore
    from inputlayer_spark.config import Config
    from inputlayer_spark.engine import IQLEngine
    from inputlayer_spark.server import QueryServer

    cfg = Config.from_file(str(tmp_path / "config.toml"), env={})
    auth = AuthStore(cfg.http.auth.credentials_file)
    auth.add_user("admin", cfg.http.auth.bootstrap_admin_password, "admin")
    srv = QueryServer(spark, host=cfg.http.host, port=cfg.http.port, auth=auth)
    srv.engine = IQLEngine(spark, wal_dir=cfg.storage.data_dir)
    srv.engine.auth_store = auth
    srv.start()
    try:
        key = auth.issue_api_key("admin")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"query": "+cfg_t(1)\n?cfg_t(X)"}).encode(),
            headers={"X-API-Key": key},
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["results"][0]["rows"] == [[1]]
        # durable: the WAL landed under the configured data_dir
        import os

        assert os.path.isdir(f"{tmp_path}/kgdata")
    finally:
        srv.stop()


def test_auto_create_and_max_kgs_bindings(spark):
    """storage.auto_create_knowledge_graphs=false → `.kg use` on a
    missing KG errors (the reference's production default);
    storage.max_knowledge_graphs caps `.kg create`."""
    import pytest

    from inputlayer_spark.compiler import CompileError
    from inputlayer_spark.engine import IQLEngine

    eng = IQLEngine(spark)
    eng.auto_create_kgs = False
    with pytest.raises(CompileError, match="does not exist"):
        eng.execute(".kg use nope")
    eng.execute(".kg create yes\n.kg use yes")  # create-then-use still fine
    eng.max_kgs = 2  # default + yes already exist
    with pytest.raises(CompileError, match="max_knowledge_graphs"):
        eng.execute(".kg create third")
    eng.execute(".kg create yes")  # existing name: idempotent, not capped


def test_persistence_format_binding(spark, tmp_path):
    """storage.persistence.format drives save_kg/.compact snapshots; the
    catalog records the format so load_kg reads it back regardless of
    the loader engine's own setting."""
    from inputlayer_spark.engine import IQLEngine

    eng = IQLEngine(spark)
    eng.persist_format = "json"
    eng.execute('+fmt_rel[(1, "a"), (2, "b")]')
    eng.save_kg(str(tmp_path / "snap"))
    assert (tmp_path / "snap" / "relations" / "fmt_rel.json").is_dir()

    eng2 = IQLEngine(spark)  # default parquet loader reads the catalog
    eng2.load_kg(str(tmp_path / "snap"))
    got = sorted(tuple(r) for r in eng2.query("?fmt_rel(X, Y)").collect())
    assert got == [(1, "a"), (2, "b")]


def test_magic_sets_and_join_planning_toggles(spark):
    """Disabling either optimization must not change answers — magic
    falls back to full-fixpoint-then-filter, join planning to literal
    body order."""
    from inputlayer_spark import compiler
    from inputlayer_spark.engine import IQLEngine

    prog = (
        "+edge[(1, 2), (2, 3), (3, 4)]\n"
        "+reach(X, Y) <- edge(X, Y)\n"
        "+reach(X, Z) <- edge(X, Y), reach(Y, Z)"
    )
    eng = IQLEngine(spark)
    eng.execute(prog)
    want = sorted(tuple(r) for r in eng.query("?reach(1, Y)").collect())

    eng2 = IQLEngine(spark)
    eng2.enable_magic_sets = False
    eng2.execute(prog)
    assert sorted(tuple(r) for r in eng2.query("?reach(1, Y)").collect()) == want

    try:
        compiler.JOIN_PLANNING_ENABLED = False
        eng3 = IQLEngine(spark)
        eng3.execute(
            "+e[(1, 10), (2, 20)]\n+f[(10, 7)]\n"
            "+sg(A, C, B) <- e(A, X), e(B, Y), f(X, C)"
        )
        got = sorted(tuple(r) for r in eng3.query("?sg(A, C, B)").collect())
        assert got == [(1, 7, 1), (1, 7, 2)]
    finally:
        compiler.JOIN_PLANNING_ENABLED = True


def test_query_timeout_returns_408(spark):
    """performance.query_timeout_ms: the /query watchdog cancels the
    request's Spark job group at the deadline and the client gets 408;
    subsequent fast queries still succeed."""
    import pytest
    from pyspark.sql import functions as F

    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark, query_timeout_ms=600)
    big = spark.range(0, 5000).select(F.col("id").alias("c0"))
    srv.engine.register("big_a", big)
    srv.engine.register("big_b", big)
    srv.engine.execute("+cross(A, B) <- big_a(A), big_b(B)")
    srv.start()
    try:
        # a RULE registration is a mutation — untimed by design; the
        # read-only query over the 25M-row cross product gets the watchdog
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"query": "?cross(A, B)"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=120)
        assert e.value.code == 408
        assert "timed out" in json.loads(e.value.read())["error"]
        # the server (and its writer lock) survive the cancellation
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"query": "+ok(1)\n?ok(X)"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req2, timeout=120) as resp:
            assert json.loads(resp.read())["results"][0]["rows"] == [[1]]
    finally:
        srv.stop()


def test_session_engine_idle_eviction(spark):
    """http.auth.session_timeout_secs: session engines idle past the
    window are evicted (their overlays drop); active ones survive."""
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark)
    srv.session_timeout_secs = 1
    a = srv._engine_for("sess-a")
    assert srv._engine_for("sess-a") is a  # stable while fresh
    srv._session_last_use["sess-a"] -= 5  # age it past the window
    srv._engine_for("sess-b")  # any other access sweeps
    assert "sess-a" not in srv.sessions
    srv.stop()  # release the job-source registration


def test_watchdog_skips_cancel_with_second_job_source(spark):
    """ADVICE r7: cancelAllJobs() kills every job on the shared
    SparkContext. With a second registered job source the watchdog must
    NOT cancel — the request degrades to a report-only 408 after the
    query completes, and the bystander's jobs survive."""
    import pytest
    from pyspark.sql import functions as F

    from inputlayer_spark.server import QueryServer
    from inputlayer_spark.session import (
        register_job_source,
        sole_job_source,
        unregister_job_source,
    )

    srv = QueryServer(spark, query_timeout_ms=400)
    big = spark.range(0, 3000).select(F.col("id").alias("c0"))
    srv.engine.register("big_a", big)
    srv.engine.register("big_b", big)
    srv.engine.execute("+cross(A, B) <- big_a(A), big_b(B)")
    other = register_job_source(spark, "bystander-stream")
    assert not sole_job_source(spark, srv._job_source)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"query": "?cross(A, B)"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        # the 9M-row cross product RUNS TO COMPLETION (no cancel), then
        # reports the blown deadline as 408
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=300)
        assert e.value.code == 408
        # a bystander job submitted right after is untouched (nothing
        # cancelled it while the watchdog was live)
        assert spark.range(5).count() == 5
    finally:
        srv.stop()
        unregister_job_source(spark, other)
    # stop() released the server's own registration
    assert srv._job_source is None


def test_session_engines_inherit_config_bindings(spark):
    """Per-session engines must carry the shared engine's config-bound
    attributes — a session-scoped .agent would otherwise fall back to
    the public default LLM endpoint instead of the configured proxy."""
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark)
    srv.engine.agent_llm_url = "http://proxy.internal/v1"
    srv.engine.agent_llm_version = "2099-01-01"
    srv.engine.max_query_cost = 123
    eng = srv._engine_for("sess-1")
    assert eng is not srv.engine
    assert eng.agent_llm_url == "http://proxy.internal/v1"
    assert eng.agent_llm_version == "2099-01-01"
    assert eng.max_query_cost == 123
    srv.stop()


def test_maintainer_restart_does_not_leak_job_source(spark, tmp_path):
    """start() after a dead stream (no stop()) must not orphan a
    job-source token — that would permanently disable every watchdog
    on the context."""
    from pyspark.sql import types as T

    from inputlayer_spark.engine import IQLEngine
    from inputlayer_spark.session import (
        register_job_source,
        sole_job_source,
        unregister_job_source,
    )
    from inputlayer_spark.streaming.maintainer import IncrementalMaintainer

    src = tmp_path / "in"
    src.mkdir()
    eng = IQLEngine(spark)
    eng.execute("+edge[(1, 2)]")
    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    m = IncrementalMaintainer(
        eng, "edge", str(src), schema, str(tmp_path / "ckpt"), refresh=False
    )
    m.process_available()
    first = m._job_source
    assert first is None  # process_available stops (and unregisters)
    q = m.start(processing_interval=None)
    tok1 = m._job_source
    q.awaitTermination()
    # restart WITHOUT stop(): old token must be released, not orphaned
    q2 = m.start(processing_interval=None)
    tok2 = m._job_source
    q2.awaitTermination()
    assert tok1 != tok2
    # the maintainer's CURRENT token is registered, the old one is
    # not: a probe alongside tok2 sees exactly those two (token-level
    # check — other suites' leftovers must not affect this test)
    from inputlayer_spark import session as sess_mod

    live = sess_mod._JOB_SOURCES.get(id(spark), {})
    assert tok2 in live and tok1 not in live
    m.stop()
    assert m._job_source is None
    live = sess_mod._JOB_SOURCES.get(id(spark), {})
    assert tok2 not in live


def test_watchdog_cancel_loop_rechecks_job_sources_every_lap():
    """ADVICE r8 TOCTOU: the watchdog checked sole_job_source once at
    the deadline, then looped cancelAllJobs — a bystander registering
    just after the check had its jobs killed for the rest of the loop.
    The loop must re-check every lap and bail as soon as a second
    source appears. Unit-level with a fake context (no timing)."""
    import threading

    from inputlayer_spark.server import _cancel_until_acknowledged
    from inputlayer_spark.session import (
        register_job_source,
        sole_job_source,
        unregister_job_source,
    )

    class FakeCtx:
        def __init__(self):
            self.cancels = 0

        def cancelAllJobs(self):
            self.cancels += 1

    class FakeSpark:
        def __init__(self):
            self.sparkContext = FakeCtx()

    fake = FakeSpark()
    mine = register_job_source(fake, "server")
    other = [None]
    done = threading.Event()

    real_cancel = fake.sparkContext.cancelAllJobs

    def cancel_then_register():
        real_cancel()
        if fake.sparkContext.cancels == 2:
            # a maintainer registers mid-loop, AFTER the entry check
            other[0] = register_job_source(fake, "bystander")

    fake.sparkContext.cancelAllJobs = cancel_then_register
    try:
        t = threading.Thread(
            target=_cancel_until_acknowledged,
            args=(fake, done, mine, 0.01),
        )
        t.start()
        t.join(timeout=10)
        assert not t.is_alive()  # bailed out without done being set
        assert fake.sparkContext.cancels == 2  # no cancel after register
        assert not sole_job_source(fake, mine)
    finally:
        done.set()
        unregister_job_source(fake, mine)
        if other[0] is not None:
            unregister_job_source(fake, other[0])
