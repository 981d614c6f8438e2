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
import os
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


class ODataResponseMemoryBuffer:
    """Driver-memory page buffer (ODataResponseBufferMemory,
    ODataResponseBuffer.scala): fine for small extracts; `switch_if_necessary`
    promotes it to the file buffer once the accumulated payload crosses the
    threshold, carrying existing pages over."""

    def __init__(self) -> None:
        self.responses: list[str] = []

    def add_response(self, payload: str) -> None:
        self.responses.append(payload)

    def add_responses(self, payloads: list[str]) -> None:
        for p in payloads:
            self.add_response(p)

    @property
    def stored_chars(self) -> int:
        return sum(len(p) for p in self.responses)

    def iter_records(self):
        for p in self.responses:
            yield from json.loads(p).get("value", [])

    def get_dataframe(self, spark: SparkSession, schema=None) -> DataFrame:
        records = list(self.iter_records())
        if schema:
            return spark.createDataFrame(records, schema=schema)
        return spark.createDataFrame(records)

    def cleanup(self) -> None:
        self.responses = []


class ODataResponseFileBuffer:
    """Temp-directory page buffer (ODataResponseBufferFile): each page's
    records are appended as JSON Lines under the temp dir, so the DataFrame
    is built by a DISTRIBUTED spark.read.json over the directory — the
    driver only ever streams raw page bytes to disk, it never materializes
    the record set. The 100 TB-minded path for big OData extracts."""

    def __init__(self, temp_dir: str) -> None:
        self.temp_dir = temp_dir
        self._n = 0
        self.make_temp_dir_if_not_exists()
        # a fresh extraction must not read a previous run's spill files:
        # clear leftovers up front (the result DataFrame is lazy over this
        # dir, so cleanup can't run right after the read either)
        for f in os.listdir(self.temp_dir):
            if f.startswith("page_") and f.endswith(".json"):
                os.remove(os.path.join(self.temp_dir, f))

    def make_temp_dir_if_not_exists(self) -> None:
        os.makedirs(self.temp_dir, exist_ok=True)

    def generate_file_name(self) -> str:
        self._n += 1
        return os.path.join(self.temp_dir, f"page_{self._n:06d}.json")

    def add_response(self, payload: str) -> None:
        records = json.loads(payload).get("value", [])
        with open(self.generate_file_name(), "w") as fh:
            for r in records:
                fh.write(json.dumps(r) + "\n")

    def add_responses(self, payloads: list[str]) -> None:
        for p in payloads:
            self.add_response(p)

    def get_dataframe(self, spark: SparkSession, schema=None) -> DataFrame:
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return reader.json(self.temp_dir)

    def cleanup(self) -> None:
        import shutil

        if os.path.isdir(self.temp_dir):
            shutil.rmtree(self.temp_dir)


def switch_buffer_if_necessary(buffer, threshold: int | None, temp_dir: str | None):
    """Promote a memory buffer to the file buffer when its payload exceeds
    `threshold` chars and a temp dir is configured; below threshold — or
    without a temp dir — the buffer stays as it is
    (ODataResponseBuffer.switchIfNecessary)."""
    if (
        isinstance(buffer, ODataResponseMemoryBuffer)
        and threshold is not None
        and buffer.stored_chars > threshold
        and temp_dir
    ):
        promoted = ODataResponseFileBuffer(temp_dir)
        promoted.add_responses(buffer.responses)
        buffer.cleanup()
        return promoted
    return buffer


@register_data_object_type
class ODataDataObject(WebserviceFileDataObject, CanCreateIncrementalOutput):
    """OData v4 entity set (ODataDataObject.scala:227-241): $select/$filter
    pushdown, @odata.nextLink paging, optional incremental filter from the
    persisted state expression, and a memory→temp-file response buffer for
    large extracts."""

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
        response_buffer_threshold: int | None = None,
        temp_file_path: str | None = None,
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
        self.response_buffer_threshold = response_buffer_threshold
        self.temp_file_path = temp_file_path
        self._incremental_state: str | None = None

    def validate_configuration(self) -> None:
        """Config consistency checks (ODataDataObjectTest:470-580): the
        incremental filter column must exist in the declared schema — without
        a schema the filter expression can never be applied to the frame."""
        from smart_data_lake_spark.config import ConfigError

        if self.incremental_filter_col:
            if not self.schema:
                raise ConfigError(
                    f"({self.id}) incremental mode requires a schema declaring "
                    f"{self.incremental_filter_col!r}"
                )
            from smart_data_lake_spark.dataobjects.base import _parse_schema

            schema = _parse_schema(self.schema)
            if self.incremental_filter_col not in schema.fieldNames():
                raise ConfigError(
                    f"({self.id}) incremental filter column "
                    f"{self.incremental_filter_col!r} not in schema {schema.fieldNames()}"
                )

    def prepare(self, spark) -> None:
        super().prepare(spark)
        self.validate_configuration()

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

    def _fetch_page(self, url: str) -> str:
        """One page with nRetry attempts; a terminal failure names the
        object and URL (ODataDataObjectTest:900-1034 retry + error
        message scenarios)."""
        last_err = None
        for _ in range(max(1, self.n_retry)):
            try:
                return self.fetch(url).decode()
            except Exception as e:  # noqa: BLE001 — retried per nRetry
                last_err = e
        raise RuntimeError(
            f"({self.id}) OData request failed after {self.n_retry} attempt(s) "
            f"for {url}: {last_err}"
        ) from last_err

    def fetch_pages_into(self, buffer):
        """Follow @odata.nextLink until exhausted, spilling pages into the
        buffer (memory, or promoted to the temp-file buffer past the
        threshold). Returns the (possibly promoted) buffer."""
        url = self.build_query_url()
        fetched = 0
        while url:
            payload_str = self._fetch_page(url)
            buffer.add_response(payload_str)
            buffer = switch_buffer_if_necessary(
                buffer, self.response_buffer_threshold, self.temp_file_path
            )
            payload = json.loads(payload_str)
            fetched += len(payload.get("value", []))
            url = payload.get("@odata.nextLink")
            if self.max_record_count is not None and fetched >= self.max_record_count:
                break
        return buffer

    def fetch_all_records(self) -> list[dict]:
        """Driver-side record list (memory buffer only) — small extracts."""
        buffer = self.fetch_pages_into(ODataResponseMemoryBuffer())
        records = list(buffer.iter_records())
        if self.max_record_count is not None:
            records = records[: self.max_record_count]
        return records

    #: init-phase reads return the declared schema without an HTTP call
    supports_phase = True

    def get_dataframe(self, spark: SparkSession, partition_values=None, phase: str = "exec") -> DataFrame:
        if phase == "init":
            # no remote call during plan building (ODataDataObjectTest:434)
            from smart_data_lake_spark.config import ConfigError
            from smart_data_lake_spark.dataobjects.base import _parse_schema

            if not self.schema:
                raise ConfigError(f"({self.id}) init-phase read requires a schema")
            return spark.createDataFrame([], _parse_schema(self.schema))
        buffer = self.fetch_pages_into(ODataResponseMemoryBuffer())
        df = buffer.get_dataframe(spark, self.schema)
        if self.max_record_count is not None:
            df = df.limit(self.max_record_count)
        if self.incremental_filter_col:
            from pyspark.sql import functions as F

            row = df.agg(F.max(self.incremental_filter_col)).first()
            if row is not None and row[0] is not None:
                self._incremental_state = str(row[0])
        return df

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

    @staticmethod
    def parse_protocol_message(line: str) -> dict | None:
        """One Airbyte protocol message as a typed dict, or None for
        non-protocol output (AirbyteDataObjectTest:69-97: LOG,
        CONNECTION_STATUS, CATALOG, RECORD all round-trip)."""
        line = line.strip()
        if not line:
            return None
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            return None
        if not isinstance(msg, dict) or "type" not in msg:
            return None
        return msg

    def _run_connector(self, verb: str, extra: list[str] | None = None) -> list[str]:
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(self.config, f)
            cfg_path = f.name
        try:
            out = subprocess.run(
                [*self.cmd, verb, "--config", cfg_path, *(extra or [])],
                capture_output=True, text=True, check=True,
            )
            return out.stdout.splitlines()
        finally:
            os.unlink(cfg_path)

    def run_check(self) -> dict:
        """`check` verb → the CONNECTION_STATUS message
        (AirbyteDataObjectTest:74)."""
        for line in self._run_connector("check"):
            msg = self.parse_protocol_message(line)
            if msg and msg.get("type") == "CONNECTION_STATUS":
                return msg["connectionStatus"]
        raise RuntimeError(f"({self.id}) connector emitted no CONNECTION_STATUS")

    def run_discover(self) -> dict:
        """`discover` verb → the CATALOG message (AirbyteDataObjectTest:79)."""
        for line in self._run_connector("discover"):
            msg = self.parse_protocol_message(line)
            if msg and msg.get("type") == "CATALOG":
                return msg["catalog"]
        raise RuntimeError(f"({self.id}) connector emitted no CATALOG")

    def run_read(self) -> list[dict]:
        return self.parse_messages(self._run_connector("read"))

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
        partitions: list[str] | None = None,
        auth_mode: Any = None,
        client_factory: Callable[[], Any] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        self.host = host
        self.path = path.rstrip("/")
        self.port = port
        self.username = username
        self.password = password
        self.partition_layout = partition_layout
        self.partitions = partitions or []
        if partition_layout is not None:
            from smart_data_lake_spark.partitions import validate_layout_against_partitions

            validate_layout_against_partitions(partition_layout, self.partitions, id)
        # test seam: an object with listdir/stat/rename/remove/put/get —
        # production uses paramiko's SFTPClient, which has exactly that shape
        self._client_factory = client_factory
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
        if self._client_factory is not None:
            return self._client_factory()
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
        return sorted(sftp.listdir(self.path))

    def get_file(self, remote_name: str, local_path: str) -> None:
        sftp = self._client()
        sftp.get(f"{self.path}/{remote_name}", local_path)

    # ------------------------------------------------- FileRefs + partitions
    def _walk_remote(self, sftp, base: str) -> list[str]:
        """Recursive remote listing. Directories are detected with a listdir
        probe — SFTPClient.stat st_mode works too but the probe keeps the
        fake-client contract minimal."""
        out: list[str] = []
        for name in sorted(sftp.listdir(base)):
            full = f"{base}/{name}"
            try:
                sftp.listdir(full)
            except OSError:
                out.append(full)
            else:
                out.extend(self._walk_remote(sftp, full))
        return out

    def extract_partition_values(self, remote_path: str):
        from smart_data_lake_spark.partitions import extract_partition_values_from_path

        if self.partition_layout is None:
            return None
        rel = remote_path[len(self.path) + 1 :] if remote_path.startswith(self.path + "/") else remote_path
        return extract_partition_values_from_path(self.partition_layout, rel)

    def get_file_refs(self, partition_values: list | None = None) -> list[str]:
        """Remote data-file paths, filtered by the partition layout and the
        requested partition values (SFtpFileRefDataObjectTest:90-180)."""
        sftp = self._client()
        files = self._walk_remote(sftp, self.path)
        if self.partition_layout is None:
            return files
        out = []
        for f in files:
            fpv = self.extract_partition_values(f)
            if fpv is None:
                continue
            if partition_values and not any(
                all(fpv.as_dict.get(k) == str(v) for k, v in want.as_dict.items())
                for want in partition_values
            ):
                continue
            out.append(f)
        return out

    def list_partitions(self, spark=None) -> list:
        seen: dict[tuple, Any] = {}
        for f in self.get_file_refs():
            fpv = self.extract_partition_values(f)
            if fpv is not None:
                seen[tuple(sorted(fpv.as_dict.items()))] = fpv
        return list(seen.values())

    def rename_file_handle_already_existing(self, src: str, dst: str) -> str:
        """Remote rename; on a taken target probe dst.1, dst.2, …
        (SFtpFileRefDataObjectTest:181)."""
        sftp = self._client()
        target, suffix = dst, 0
        while True:
            try:
                sftp.stat(target)
            except OSError:
                break
            suffix += 1
            target = f"{dst}.{suffix}"
        sftp.rename(src, target)
        return target

    def put_file(self, local_path: str, remote_name: str, overwrite: bool = True) -> None:
        """Upload, replacing an existing target when `overwrite`
        (SFtpFileRefDataObjectTest:215)."""
        sftp = self._client()
        target = f"{self.path}/{remote_name}"
        try:
            sftp.stat(target)
            exists = True
        except OSError:
            exists = False
        if exists:
            if not overwrite:
                raise FileExistsError(f"({self.id}) {target} exists and overwrite=False")
            sftp.remove(target)
        sftp.put(local_path, target)

    def delete_partitions(self, partition_values: list) -> None:
        """Remove every file belonging to the given partitions — directory-
        or filename-encoded alike, the layout decides
        (SFtpFileRefDataObjectTest:252/289)."""
        sftp = self._client()
        for f in self.get_file_refs(partition_values):
            sftp.remove(f)
