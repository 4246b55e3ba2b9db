"""Tests for the .env / fail-fast config bootstrap (reference
/root/reference/src/db.py:1-18 semantics: dotenv load with no-override,
direct-file fallback, RuntimeError naming the expected path)."""

from __future__ import annotations

import pytest

from payroll_etl_fastapi_spark import config


def _write_env(tmp_path, text):
    p = tmp_path / ".env"
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_load_env_file_parses_and_does_not_override(tmp_path):
    path = _write_env(
        tmp_path,
        "﻿WAREHOUSE_DIR=/data/wh\n"
        "# comment\n"
        "export EXTRA='quoted value'\n"
        "BAD LINE WITHOUT EQUALS IS IGNORED\n"  # has no '='? it has none
        'DQ="double"\n',
    )
    env = {"WAREHOUSE_DIR": "/already/set"}
    parsed = config.load_env_file(path, env=env)
    assert parsed["WAREHOUSE_DIR"] == "/data/wh"
    assert parsed["EXTRA"] == "quoted value"
    assert parsed["DQ"] == "double"
    # no-override: the process env wins (reference load_dotenv default)
    assert env["WAREHOUSE_DIR"] == "/already/set"
    assert env["EXTRA"] == "quoted value"


def test_warehouse_dir_env_wins_then_file_then_raises(tmp_path):
    path = _write_env(tmp_path, "WAREHOUSE_DIR=/from/file\n")
    assert config.warehouse_dir(env={"WAREHOUSE_DIR": "/from/env"}, env_path=path) == "/from/env"
    assert config.warehouse_dir(env={}, env_path=path) == "/from/file"
    missing = str(tmp_path / "nope.env")
    with pytest.raises(RuntimeError, match="WAREHOUSE_DIR is not set"):
        config.warehouse_dir(env={}, env_path=missing)
    # the error names the expected file, like the reference
    with pytest.raises(RuntimeError, match="nope.env"):
        config.warehouse_dir(env={}, env_path=missing)


def test_warehouse_from_env_builds_working_warehouse(spark, tmp_path):
    path = _write_env(tmp_path, f"WAREHOUSE_DIR={tmp_path / 'wh'}\n")
    wh = config.warehouse_from_env(spark, env={}, env_path=path)
    counts = wh.load_csv("/root/reference/data/payroll.csv")
    assert counts == {"dim_dept": 6, "dim_employee": 500, "fact_payroll": 5526}
