"""HTTP-family DataObjects: Webservice, OData, Airbyte, SFTP.

Reference: `WebserviceFileDataObject.scala:83-97` (auth headers, mime type,
read/write methods, paging-link regex), `ODataDataObject.scala:227-241`
($filter/$select source filters, OAuth, incremental output expression,
nextLink paging, maxRecordCount), `AirbyteDataObject.scala:68-76` (connector
command speaking the Airbyte protocol: spec/check/discover/read, RECORD
messages become rows), `SFtpFileRefDataObject.scala:60-69`.

Scale note: these are API-INGESTION sources — the bottleneck is the remote
service, not Spark. The idiomatic pattern (same as the reference) is: fetch
on the driver (paged, retried), parallelize records into a DataFrame, and
let everything downstream be distributed. A 100 TB pipeline uses these for
the small config/dimension feeds, never the fact firehose.
"""

from __future__ import annotations

import json
import subprocess
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanCreateIncrementalOutput,
    CanWriteDataFrame,
    DataObject,
)

try:
    import requests

    _HAS_REQUESTS = True
except ImportError:  # pragma: no cover
    requests = None
    _HAS_REQUESTS = False


class HttpAuthMode:
    """Auth header factory (connection/authMode/*.scala family): basic,
    bearer token, custom header map, or OAuth2 client-credentials
    (`OAuthMode.scala:19-38` — token URL + client id/secret + scope, the
    grant ODataDataObject uses). OAuth2 tokens are fetched lazily and cached
    until 30 s before expiry, so a long paging run re-authenticates only
    when the token actually lapses."""

    def __init__(
        self,
        auth_type: str = "none",
        user: str | None = None,
        password: str | None = None,
        token: str | None = None,
        headers: dict[str, str] | None = None,
        oauth_url: str | None = None,
        client_id: str | None = None,
        client_secret: str | None = None,
        oauth_scope: str | None = None,
    ) -> None:
        self.auth_type = auth_type
        self.user = user
        self.password = password
        self.token = token
        self.headers = headers or {}
        self.oauth_url = oauth_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.oauth_scope = oauth_scope
        self._oauth_token: str | None = None
        self._oauth_expiry: float = 0.0

    def _fetch_oauth_token(self) -> str:
        import json
        import time
        import urllib.parse
        import urllib.request

        if self._oauth_token and time.monotonic() < self._oauth_expiry - 30:
            return self._oauth_token
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self.client_id or "",
                "client_secret": self.client_secret or "",
                "scope": self.oauth_scope or "",
            }
        ).encode("utf-8")
        req = urllib.request.Request(
            self.oauth_url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        self._oauth_token = payload["access_token"]
        self._oauth_expiry = time.monotonic() + float(payload.get("expires_in", 3600))
        return self._oauth_token

    def build_headers(self) -> dict[str, str]:
        if self.auth_type == "basic":
            import base64

            cred = base64.b64encode(f"{self.user}:{self.password}".encode()).decode()
            return {"Authorization": f"Basic {cred}", **self.headers}
        if self.auth_type == "bearer":
            return {"Authorization": f"Bearer {self.token}", **self.headers}
        if self.auth_type == "oauth2":
            if not self.oauth_url:
                raise ValueError("oauth2 auth requires oauth_url")
            return {"Authorization": f"Bearer {self._fetch_oauth_token()}", **self.headers}
        return dict(self.headers)


@register_data_object_type
class WebserviceFileDataObject(DataObject, CanCreateDataFrame, CanWriteDataFrame):
    """HTTP endpoint as a DataObject (WebserviceFileDataObject.scala:83-97).

    Read: GET (paged via `paging_link_regex`-free OData-style `next_link_field`
    or repeated until empty) returning JSON → DataFrame. Write: POST/PUT each
    row as JSON (or the whole payload for file semantics).
    """

    def __init__(
        self,
        id: str,
        url: str,
        additional_headers: dict[str, str] | None = None,
        auth_mode: HttpAuthMode | dict | None = None,
        mime_type: str = "application/json",
        write_method: str = "POST",
        timeout_sec: float = 60.0,
        follow_redirects: bool = False,
        records_field: str | None = None,
        schema: str | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        if isinstance(auth_mode, dict):
            if "type" in auth_mode:
                # typed family: {"type": "BasicAuthMode", "user": ..., ...}
                from smart_data_lake_spark.config import _instantiate_nested

                auth_mode = _instantiate_nested(auth_mode)
            else:
                auth_mode = HttpAuthMode(**auth_mode)
        self.url = url
        self.additional_headers = additional_headers or {}
        self.auth_mode = auth_mode or HttpAuthMode()
        self.mime_type = mime_type
        self.write_method = write_method
        self.timeout_sec = timeout_sec
        self.follow_redirects = follow_redirects
        self.records_field = records_field
        self.schema = schema

    def prepare(self, spark) -> None:
        # AuthMode.prepare() lifecycle (AuthMode.scala:40-43): validate
        # config / warm tokens during the prepare phase, not mid-request
        if hasattr(self.auth_mode, "prepare"):
            self.auth_mode.prepare()

    def post_exec_cleanup(self) -> None:
        if hasattr(self.auth_mode, "close"):
            self.auth_mode.close()

    def _headers(self) -> dict[str, str]:
        return {"Accept": self.mime_type, **self.auth_mode.build_headers(), **self.additional_headers}

    def fetch(self, url: str | None = None) -> bytes:
        if not _HAS_REQUESTS:
            raise RuntimeError(f"({self.id}) the 'requests' package is required for webservice IO")
        resp = requests.get(
            url or self.url,
            headers=self._headers(),
            timeout=self.timeout_sec,
            allow_redirects=self.follow_redirects,
        )
        resp.raise_for_status()
        return resp.content

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        payload = json.loads(self.fetch())
        records = payload.get(self.records_field, []) if self.records_field else payload
        if not isinstance(records, list):
            records = [records]
        if self.schema:
            return spark.createDataFrame(records, schema=self.schema)
        return spark.createDataFrame(records)

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        if not _HAS_REQUESTS:
            raise RuntimeError(f"({self.id}) the 'requests' package is required for webservice IO")
        # one request per row; API sinks are low-volume by nature
        n = 0
        headers = {**self._headers(), "Content-Type": self.mime_type}
        for row in df.toJSON().toLocalIterator():
            resp = requests.request(
                self.write_method, self.url, data=row.encode(), headers=headers, timeout=self.timeout_sec
            )
            resp.raise_for_status()
            n += 1
        return {"records_written": n}


@register_data_object_type
class ODataDataObject(WebserviceFileDataObject, CanCreateIncrementalOutput):
    """OData v4 entity set (ODataDataObject.scala:227-241): $select/$filter
    pushdown, @odata.nextLink paging, optional incremental filter from the
    persisted state expression."""

    def __init__(
        self,
        id: str,
        base_url: str,
        table_name: str,
        source_filters: str | None = None,
        select_cols: list[str] | None = None,
        incremental_filter_col: str | None = None,
        max_record_count: int | None = None,
        n_retry: int = 1,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, url=base_url.rstrip("/") + "/" + table_name, **kwargs)
        self.base_url = base_url
        self.table_name = table_name
        self.source_filters = source_filters
        self.select_cols = select_cols
        self.incremental_filter_col = incremental_filter_col
        self.max_record_count = max_record_count
        self.n_retry = n_retry
        self._incremental_state: str | None = None

    def build_query_url(self) -> str:
        """$-parameter assembly — pure, unit-tested."""
        params = []
        if self.select_cols:
            params.append("$select=" + ",".join(self.select_cols))
        filters = []
        if self.source_filters:
            filters.append(f"({self.source_filters})")
        if self.incremental_filter_col and self._incremental_state:
            filters.append(f"({self.incremental_filter_col} gt {self._incremental_state})")
        if filters:
            params.append("$filter=" + " and ".join(filters))
        if self.max_record_count is not None:
            params.append("$top=" + str(self.max_record_count))
        return self.url + ("?" + "&".join(params) if params else "")

    def fetch_all_records(self) -> list[dict]:
        """Follow @odata.nextLink until exhausted (ODataDataObject paging)."""
        url = self.build_query_url()
        records: list[dict] = []
        while url:
            last_err = None
            for _ in range(max(1, self.n_retry)):
                try:
                    payload = json.loads(self.fetch(url))
                    last_err = None
                    break
                except Exception as e:  # noqa: BLE001 — retried per nRetry
                    last_err = e
            if last_err is not None:
                raise last_err
            records.extend(payload.get("value", []))
            url = payload.get("@odata.nextLink")
            if self.max_record_count is not None and len(records) >= self.max_record_count:
                records = records[: self.max_record_count]
                break
        return records

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        records = self.fetch_all_records()
        if self.incremental_filter_col and records:
            self._incremental_state = str(max(r[self.incremental_filter_col] for r in records))
        if self.schema:
            return spark.createDataFrame(records, schema=self.schema)
        return spark.createDataFrame(records)

    def set_state(self, state: str | None) -> None:
        self._incremental_state = state

    def get_state(self) -> str | None:
        return self._incremental_state


@register_data_object_type
class AirbyteDataObject(DataObject, CanCreateDataFrame):
    """Run an Airbyte source connector and surface its RECORD messages as a
    DataFrame (AirbyteDataObject.scala:68-76: cmd + config + stream name).

    The connector is any executable speaking the Airbyte protocol on stdout
    (docker run, python connector, test stub). Driver-side subprocess —
    connector throughput is the bottleneck by design.
    """

    def __init__(
        self,
        id: str,
        cmd: list[str],
        config: dict | None = None,
        stream_name: str = "",
        schema: str | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        self.cmd = cmd
        self.config = config or {}
        self.stream_name = stream_name
        self.schema = schema

    def parse_messages(self, lines) -> list[dict]:
        """Extract RECORD payloads for our stream from protocol output."""
        records = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue  # connectors log freely on stdout
            if msg.get("type") == "RECORD":
                rec = msg.get("record", {})
                if not self.stream_name or rec.get("stream") == self.stream_name:
                    records.append(rec.get("data", {}))
        return records

    def run_read(self) -> list[dict]:
        import tempfile, os

        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(self.config, f)
            cfg_path = f.name
        try:
            out = subprocess.run(
                [*self.cmd, "read", "--config", cfg_path],
                capture_output=True, text=True, check=True,
            )
            return self.parse_messages(out.stdout.splitlines())
        finally:
            os.unlink(cfg_path)

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        records = self.run_read()
        if self.schema:
            return spark.createDataFrame(records, schema=self.schema)
        return spark.createDataFrame(records)


@register_data_object_type
class SFtpFileRefDataObject(DataObject):
    """SFTP file listing/transfer (SFtpFileRefDataObject.scala:60-69).
    Requires `paramiko`, which this container lacks — constructor works (so
    configs parse), IO raises with a clear message."""

    def __init__(
        self,
        id: str,
        host: str,
        path: str,
        port: int = 22,
        username: str | None = None,
        password: str | None = None,
        partition_layout: str | None = None,
        auth_mode: Any = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        self.host = host
        self.path = path
        self.port = port
        self.username = username
        self.password = password
        self.partition_layout = partition_layout
        if isinstance(auth_mode, dict) and "type" in auth_mode:
            from smart_data_lake_spark.config import _instantiate_nested

            auth_mode = _instantiate_nested(auth_mode)
        self.auth_mode = auth_mode

    def _connect_kwargs(self) -> dict[str, Any]:
        """paramiko connect kwargs from the typed auth mode (PublicKeyAuthMode
        → agent/default keys; BasicAuthMode → user/password) or the legacy
        username/password fields."""
        from smart_data_lake_spark.auth_modes import BasicAuthMode, PublicKeyAuthMode
        from smart_data_lake_spark.config import resolve_secret

        if isinstance(self.auth_mode, PublicKeyAuthMode):
            return self.auth_mode.sftp_connect_kwargs()
        if isinstance(self.auth_mode, BasicAuthMode):
            return {
                "username": resolve_secret(self.auth_mode.user),
                "password": resolve_secret(self.auth_mode.password),
                "allow_agent": False,
                "look_for_keys": False,
            }
        return {"username": self.username, "password": self.password}

    def _client(self):
        try:
            import paramiko  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                f"({self.id}) SFTP transfer requires the 'paramiko' package (not installed)"
            ) from e
        client = paramiko.SSHClient()  # pragma: no cover — needs paramiko + server
        client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        client.connect(self.host, port=self.port, **self._connect_kwargs())
        return client.open_sftp()

    def list_files(self) -> list[str]:
        sftp = self._client()
        return sorted(sftp.listdir(self.path))  # pragma: no cover

    def get_file(self, remote_name: str, local_path: str) -> None:
        sftp = self._client()
        sftp.get(f"{self.path}/{remote_name}", local_path)  # pragma: no cover
