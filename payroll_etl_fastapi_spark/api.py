"""Service layer: the reference's five HTTP endpoints over the Spark engine.

Mirrors /root/reference/src/api.py routes, parameters, status codes and
response shapes: /health, /kpi/summary, /kpi/by-dept, /kpi/delta,
/kpi/anomalies (the second, working definition — SURVEY.md §2.8.1). The
engine work is all in plans/kpi.py; this layer only collects (KPI results are
intrinsically small — ≤ #depts or ≤ limit rows) and serializes.

`PayrollService` is framework-free so the engine can be driven from tests or
notebooks; `create_app()` wires it into FastAPI when that package is
available (it is not baked into this container — import-gated, same thin
shell either way).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Row

from payroll_etl_fastapi_spark.etl import PayrollWarehouse
from payroll_etl_fastapi_spark.plans import kpi


class NotFound(Exception):
    """Maps to HTTP 404 — reference raises HTTPException(404)."""


def _floats(d: dict[str, Any]) -> dict[str, Any]:
    """Decimal→float edge coercion analog (/root/reference/src/api.py:256-257);
    DoubleType makes this a near-no-op but keeps the JSON shape identical."""
    return {
        k: (float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) and k not in ("headcount",) else v)
        for k, v in d.items()
    }


class PayrollService:
    """The five reference endpoints as plain methods returning JSON-able data."""

    def __init__(self, warehouse: PayrollWarehouse):
        self.wh = warehouse

    def _tables(self):
        return (
            self.wh.read("fact_payroll"),
            self.wh.read("dim_employee"),
            self.wh.read("dim_dept"),
        )

    def health(self) -> dict[str, str]:
        return {"status": "ok"}

    def summary(self, month: str) -> dict[str, Any]:
        """404 keys on SUM(gross) IS NULL, not on row absence — an all-null
        month with rows still 404s (/root/reference/src/api.py:39-40)."""
        fact, _, _ = self._tables()
        row: Row = kpi.kpi_summary(fact, month).first()
        if row is None or row["gross"] is None:
            raise NotFound("No data for month")
        return _floats(row.asDict())

    def by_dept(self, month: str) -> list[dict[str, Any]]:
        fact, emp, dept = self._tables()
        rows = kpi.kpi_by_dept(fact, emp, dept, month).collect()
        if not rows:
            raise NotFound("No data for month")
        return [_floats(r.asDict()) for r in rows]

    def delta(self, m1: str, m2: str) -> dict[str, Any]:
        fact, emp, dept = self._tables()
        company_df, by_dept_df = kpi.kpi_delta(fact, emp, dept, m1, m2)
        comp = company_df.first().asDict()
        return {
            "company": {k: float(v or 0) for k, v in comp.items()},
            "by_dept": [_floats(r.asDict()) for r in by_dept_df.collect()],
        }

    def anomalies(
        self,
        month: str,
        threshold: float = 3.5,
        limit: int = 10,
        dept: str | None = None,
    ) -> list[dict[str, Any]]:
        fact, emp, dd = self._tables()
        rows = kpi.kpi_anomalies(fact, emp, dd, month, threshold, limit, dept).collect()
        return [
            {
                "emp_id": r["emp_id"],
                "dept": r["dept"],
                "net": float(r["net"]) if r["net"] is not None else None,
                "median_net": float(r["median_net"]) if r["median_net"] is not None else None,
                "mad": float(r["mad"]) if r["mad"] is not None else None,
                "z": float(r["z"]) if r["z"] is not None else None,
            }
            for r in rows
        ]


def serve_http(service: PayrollService, host: str = "127.0.0.1", port: int = 0):
    """Stdlib HTTP shell: the same five routes over ``http.server`` — a real
    socket server usable (and testable) where fastapi isn't installed.

    Semantics mirror the reference app (/root/reference/src/api.py): JSON
    bodies, 404 via NotFound, 422 on missing/malformed required query params
    (FastAPI's validation status), 404 for unknown paths. Returns the started
    ``ThreadingHTTPServer`` (already bound; call ``serve_forever`` yourself or
    from a thread, ``shutdown()`` to stop) so tests control its lifecycle."""
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class _MissingParam(Exception):
        pass

    def _one(params: dict, name: str, cast=str, default=..., nullable: bool = False):
        vals = params.get(name)
        if not vals:
            if default is not ...:
                return default
            raise _MissingParam(name)
        try:
            return cast(vals[0])
        except (TypeError, ValueError):
            raise _MissingParam(name)

    routes = {
        "/health": lambda p: service.health(),
        "/kpi/summary": lambda p: service.summary(_one(p, "month")),
        "/kpi/by-dept": lambda p: service.by_dept(_one(p, "month")),
        "/kpi/delta": lambda p: service.delta(_one(p, "m1"), _one(p, "m2")),
        "/kpi/anomalies": lambda p: service.anomalies(
            _one(p, "month"),
            threshold=_one(p, "threshold", float, 3.5),
            limit=_one(p, "limit", int, 10),
            dept=_one(p, "dept", str, None),
        ),
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # keep test output clean
            pass

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            handler = routes.get(url.path)
            if handler is None:
                return self._send(404, {"detail": "Not Found"})
            try:
                body = handler(parse_qs(url.query))
            except NotFound as e:
                return self._send(404, {"detail": str(e)})
            except _MissingParam as e:
                return self._send(422, {"detail": f"invalid or missing query param: {e}"})
            self._send(200, body)

        def _send(self, status: int, payload) -> None:
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return ThreadingHTTPServer((host, port), Handler)


def create_app(service: PayrollService):
    """FastAPI wiring (reference route signatures); requires fastapi installed."""
    from fastapi import FastAPI, HTTPException

    app = FastAPI(title="payroll-etl-fastapi-spark")

    def guard(fn, *args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except NotFound as e:
            raise HTTPException(status_code=404, detail=str(e))

    @app.get("/health")
    def health():
        return service.health()

    @app.get("/kpi/summary")
    def summary(month: str):
        return guard(service.summary, month)

    @app.get("/kpi/by-dept")
    def by_dept(month: str):
        return guard(service.by_dept, month)

    @app.get("/kpi/delta")
    def delta(m1: str, m2: str):
        return guard(service.delta, m1, m2)

    @app.get("/kpi/anomalies")
    def anomalies(month: str, threshold: float = 3.5, limit: int = 10, dept: str | None = None):
        return guard(service.anomalies, month, threshold, limit, dept)

    return app
