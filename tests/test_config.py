"""Config-system tests (reference src/config.rs semantics: layered
toml + local overrides + INPUTLAYER_* env with `__` nesting,
deny-unknown-fields, type validation)."""

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
