"""Environment-driven configuration bootstrap — the reference's `.env` /
fail-fast contract (/root/reference/src/db.py:1-18: load .env with dotenv,
fall back to reading the file directly, raise naming the expected path when
DB_URL is still unset) re-expressed for the file-warehouse engine.

The engine's connection string is a warehouse directory instead of a
Postgres URL, so the analog key is ``WAREHOUSE_DIR``. python-dotenv is not
available in this environment; `load_env_file` is a dependency-free parser
of the same KEY=VALUE format (comments, blank lines, optional `export `,
single/double quotes), and — like the reference — values already present in
the process environment WIN over the file (dotenv's no-override default).
"""

from __future__ import annotations

import os
from collections.abc import MutableMapping

__all__ = ["load_env_file", "warehouse_dir", "warehouse_from_env"]

ENV_KEY = "WAREHOUSE_DIR"
DEFAULT_ENV_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".env")


def load_env_file(
    path: str, env: MutableMapping[str, str] | None = None
) -> dict[str, str]:
    """Parse ``path`` as dotenv KEY=VALUE lines and merge into ``env``
    (default os.environ) WITHOUT overriding keys already set — the
    reference's load_dotenv default. Returns the parsed mapping (the
    reference's dotenv_values fallback reads the file directly even when
    os.environ didn't take the value). A missing file parses as {} — the
    caller decides whether that is fatal."""
    parsed: dict[str, str] = {}
    if not os.path.isfile(path):
        return parsed
    with open(path, encoding="utf-8-sig") as fh:  # tolerate a BOM like the reference's file
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
                value = value[1:-1]
            if key:
                parsed[key] = value
    if env is None:
        env = os.environ
    for k, v in parsed.items():
        env.setdefault(k, v)
    return parsed


def warehouse_dir(
    env: MutableMapping[str, str] | None = None,
    env_path: str = DEFAULT_ENV_PATH,
) -> str:
    """The configured warehouse root, fail-fast: process env first, then a
    direct read of the .env file (both reference fallbacks), else a
    RuntimeError that names the expected file — never a silently-guessed
    path (reference: ``DB_URL is not set. Expected in {ENV_PATH}``)."""
    e = os.environ if env is None else env
    parsed = load_env_file(env_path, env=e)
    value = e.get(ENV_KEY) or parsed.get(ENV_KEY)
    if not value:
        raise RuntimeError(
            f"{ENV_KEY} is not set. Expected in the environment or {env_path}"
        )
    return value


def warehouse_from_env(spark, env=None, env_path: str = DEFAULT_ENV_PATH):
    """A PayrollWarehouse rooted at the configured directory — the composed
    bootstrap the reference performs at import time (db.engine). Deliberately
    a function, not import-time state: a Spark engine must not crash on
    import of an unrelated module because the warehouse env is unset."""
    from payroll_etl_fastapi_spark.etl import PayrollWarehouse

    return PayrollWarehouse(spark, warehouse_dir(env=env, env_path=env_path))
