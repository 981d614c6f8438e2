"""Splunk search DataObject.

Reference: `sdl-splunk/.../dataobject/SplunkDataObject.scala:19-140` and
`connection/SplunkConnection.scala:19-60`. The reference wraps the Splunk
Java SDK; underneath, that SDK is the documented REST API — which is all
this rebuild needs: `POST /services/search/jobs/export` with
`output_mode=json` streams one JSON object per result row, and
`GET /services/server/info` is the connection test. Basic (user/password)
and bearer-token auth modes, mirroring the connection's supportedAuths.

Semantics preserved from the reference:

* `query` must name an index (`index=`) and is prefixed with `search ` when
  missing (SplunkDataObject.validateQuery).
* The [query_from, query_to) range splits into `query_time_interval`-sized
  windows (splitQueryTimes) that fan out over executors —
  `parallel_requests` controls the repartition, so N windows hit the Splunk
  endpoint from N tasks concurrently. Each task streams ONLY its window.
* Schema projection: declared columns are picked from each result map
  (missing → ""); a single-column schema receives the stringified raw event
  (transformToRows:96-104).

Scale shape: the driver never touches row data — it only enumerates time
windows; each executor task holds one window's results at a time. Splunk
itself is the bottleneck by design (parallel_requests throttles it).
"""

from __future__ import annotations

import base64
import datetime as dt
import json
import urllib.parse
import urllib.request
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from smart_data_lake_spark.config import (
    register_connection_type,
    register_data_object_type,
)
from smart_data_lake_spark.dataobjects.base import CanCreateDataFrame, DataObject

_TIME_FMT = "%Y-%m-%d %H:%M"  # config format (the reference's SF_TIME_FORMAT)
# wire format: Splunk's earliest_time/latest_time accept ISO-8601 (or epoch /
# relative modifiers) — NOT the config's space-separated form; the reference
# converts via toSplunkStringFormat before sending, and so do we
_WIRE_FMT = "%Y-%m-%dT%H:%M:%S"


@register_connection_type
class SplunkConnection:
    """Host/port/auth in one place (SplunkConnection.scala:19-60).
    Auth: basic (user+password) or bearer token — the two supported modes."""

    def __init__(
        self,
        id: str,
        url: str,
        user: str | None = None,
        password: str | None = None,
        token: str | None = None,
        timeout_sec: float = 60.0,
    ) -> None:
        if not token and not (user and password):
            raise ValueError(f"({id}) splunk auth needs token or user+password")
        self.id = id
        self.url = url.rstrip("/")
        self.user = user
        self.password = password
        self.token = token
        self.timeout_sec = timeout_sec

    def _auth_header(self) -> str:
        if self.token:
            return f"Bearer {self.token}"
        raw = base64.b64encode(f"{self.user}:{self.password}".encode()).decode("ascii")
        return f"Basic {raw}"

    def test(self) -> None:
        """Connection test (SplunkConnection.test → server/info)."""
        req = urllib.request.Request(
            f"{self.url}/services/server/info?output_mode=json",
            headers={"Authorization": self._auth_header()},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            if resp.status != 200:
                raise ConnectionError(f"({self.id}) splunk server/info returned {resp.status}")

    def export(self, query: str, earliest: str, latest: str) -> list[dict[str, str]]:
        """Streamed export search: one JSON object per line, `result` holds
        the field map (the REST shape under the SDK's export())."""
        body = urllib.parse.urlencode(
            {
                "search": query,
                "earliest_time": earliest,
                "latest_time": latest,
                "output_mode": "json",
            }
        ).encode("utf-8")
        req = urllib.request.Request(
            f"{self.url}/services/search/jobs/export",
            data=body,
            headers={"Authorization": self._auth_header()},
            method="POST",
        )
        rows: list[dict[str, str]] = []
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            for line in resp.read().decode("utf-8").splitlines():
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                if "result" in obj:
                    rows.append({str(k): str(v) for k, v in obj["result"].items()})
        return rows


def validate_query(query: str) -> str:
    """SplunkDataObject.validateQuery: index required, `search ` prefixed."""
    if "index=" not in query:
        raise ValueError("Splunk queries should define the index the search should work on.")
    if not query.startswith("search"):
        return "search " + query
    return query


def split_query_times(
    start: dt.datetime, end: dt.datetime, interval: dt.timedelta
) -> list[tuple[str, str]]:
    """[start, end) → consecutive windows of `interval` (last one clipped) —
    SplunkDataObject.splitQueryTimes."""
    if end < start:
        raise ValueError("query_to before query_from")
    out: list[tuple[str, str]] = []
    cur = start
    while cur < end:
        nxt = min(cur + interval, end)
        out.append((cur.strftime(_WIRE_FMT), nxt.strftime(_WIRE_FMT)))
        cur = nxt
    return out or [(start.strftime(_WIRE_FMT), end.strftime(_WIRE_FMT))]


@register_data_object_type
class SplunkDataObject(DataObject, CanCreateDataFrame):
    def __init__(
        self,
        id: str,
        query: str,
        query_from: str | dt.datetime,
        query_to: str | dt.datetime,
        connection: SplunkConnection | dict,
        query_time_interval_min: int = 10,
        parallel_requests: int = 2,
        schema: str | T.StructType | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        if isinstance(connection, dict):
            connection = SplunkConnection(**connection)
        self.connection = connection
        self.query = validate_query(query)
        self.query_from = (
            dt.datetime.strptime(query_from, _TIME_FMT) if isinstance(query_from, str) else query_from
        )
        self.query_to = (
            dt.datetime.strptime(query_to, _TIME_FMT) if isinstance(query_to, str) else query_to
        )
        self.query_time_interval = dt.timedelta(minutes=query_time_interval_min)
        self.parallel_requests = parallel_requests
        if schema is None:
            schema = T.StructType([T.StructField("_raw", T.StringType())])
        elif isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        self.schema = schema

    def prepare(self, spark: SparkSession) -> None:
        try:
            self.connection.test()
        except Exception as exc:  # noqa: BLE001
            raise ConnectionError(f"({self.id}) Can not connect. Error: {exc}") from exc

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        import pandas as pd

        windows = split_query_times(self.query_from, self.query_to, self.query_time_interval)
        field_names = [f.name for f in self.schema.fields]
        single_col = len(field_names) == 1
        conn_spec = {
            "url": self.connection.url,
            "user": self.connection.user,
            "password": self.connection.password,
            "token": self.connection.token,
            "timeout_sec": self.connection.timeout_sec,
        }
        query = self.query

        def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            conn = SplunkConnection(id="executor", **conn_spec)
            for pdf in batches:
                out: dict[str, list[str]] = {n: [] for n in field_names}
                for earliest, latest in zip(pdf["earliest"], pdf["latest"]):
                    for item in conn.export(query, earliest, latest):
                        if single_col:
                            out[field_names[0]].append(str(item))
                        else:
                            for n in field_names:
                                out[n].append(item.get(n, ""))
                yield pd.DataFrame(out)

        intervals = spark.createDataFrame(
            windows, "earliest string, latest string"
        ).repartition(self.parallel_requests)
        string_schema = T.StructType([T.StructField(n, T.StringType()) for n in field_names])
        df = intervals.mapInPandas(_fetch, schema=string_schema)
        if any(not isinstance(f.dataType, T.StringType) for f in self.schema.fields):
            from pyspark.sql import functions as F

            df = df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in self.schema.fields]
            )
        return df
