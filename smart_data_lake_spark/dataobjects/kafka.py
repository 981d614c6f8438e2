"""Kafka topic DataObject + offset-state incremental mode.

Reference: `sdl-kafka/src/main/scala/io/smartdatalake/workflow/dataobject/
KafkaTopicDataObject.scala` — batch read over an offset window (:235-310,
`startingOffsets`/`endingOffsets` json, optional max-offsets-per-task
chunking), stream read (:210-216), key/value decoding (:408-430), write
(:360-390) — and `KafkaStateIncrementalMode` (executionMode/ExecutionMode
.scala family): committed-offset state carried between runs.

Spark-first shape: the connector is Spark's built-in `format("kafka")` source
(distributed partition-parallel reads; one Spark task per topic-partition
offset range — the same parallelism story at 100 TB/day as at test scale).
This module is import-safe without a broker: all reader/writer OPTION
CONSTRUCTION and key/value CONVERSION logic is pure and unit-tested; only
`load()` needs a reachable cluster (`spark-sql-kafka` package + brokers).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanCreateIncrementalOutput,
    CanCreateStreamingDataFrame,
    CanWriteDataFrame,
    DataObject,
)
from smart_data_lake_spark.execution_modes import ExecutionMode, ExecutionModeResult

# columns the kafka source exposes (KafkaTopicDataObject.scala:115-118)
KAFKA_SOURCE_COLS = ["key", "value", "topic", "partition", "offset", "timestamp", "timestampType"]


def _avro_datasource_loaded() -> bool:
    """True when the spark-avro runtime is on the session's JVM classpath."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


from smart_data_lake_spark.config import register_connection_type


@register_connection_type
class KafkaConnection:
    """Broker + common reader/writer options + optional schema-registry url
    (KafkaConnection.scala; schemaRegistry at :46)."""

    def __init__(
        self,
        id: str,
        brokers: str,
        options: dict[str, str] | None = None,
        schema_registry: str | None = None,
        auth_mode: Any = None,
    ) -> None:
        self.id = id
        self.brokers = brokers
        self.options = dict(options or {})
        self.schema_registry = schema_registry
        self._registry_client = None
        if isinstance(auth_mode, dict) and "type" in auth_mode:
            from smart_data_lake_spark.config import _instantiate_nested

            auth_mode = _instantiate_nested(auth_mode)
        self.auth_mode = auth_mode
        if auth_mode is not None:
            if not hasattr(auth_mode, "kafka_options"):
                raise ValueError(
                    f"({id}) auth_mode {type(auth_mode).__name__} does not apply to Kafka "
                    "(use SASLSCRAMAuthMode or SSLCertsAuthMode)"
                )
            # explicit options win over the compiled auth options
            self.options = {**auth_mode.kafka_options(), **self.options}

    def schema_registry_client(self):
        if self.schema_registry is None:
            raise ValueError(f"({self.id}) no schemaRegistry configured on this connection")
        if self._registry_client is None:
            from smart_data_lake_spark.dataobjects.schema_registry import SchemaRegistryClient

            self._registry_client = SchemaRegistryClient(self.schema_registry)
        return self._registry_client


@register_data_object_type
class KafkaTopicDataObject(
    DataObject,
    CanCreateDataFrame,
    CanCreateStreamingDataFrame,
    CanWriteDataFrame,
    CanCreateIncrementalOutput,
):
    """One Kafka topic as a DataFrame source/sink.

    keyType/valueType ∈ {binary, string, json, avro, json_schema_registry,
    avro_schema_registry} (KafkaColumnType family). Plain avro needs the
    spark-avro runtime jar (gated with a clear error); the registry variants
    resolve Confluent-framed payloads against the connection's schemaRegistry
    and decode without it. Incremental state is a JSON offsets-by-partition
    map, fed to `startingOffsets` on the next batch read — the semantics of
    KafkaStateIncrementalMode.
    """

    def __init__(
        self,
        id: str,
        topic_name: str,
        connection: KafkaConnection | dict,
        key_type: str = "string",
        value_type: str = "string",
        key_schema: str | T.StructType | None = None,
        value_schema: str | T.StructType | None = None,
        select_cols: list[str] | None = None,
        date_partition_col: str | None = None,
        date_partition_time_format: str = "yyyyMMdd",
        batch_read_max_offsets_per_task: int | None = None,
        options: dict[str, str] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        if isinstance(connection, dict):
            connection = KafkaConnection(**connection)
        registry_types = ("json_schema_registry", "avro_schema_registry")
        for side, typ, schema in (("key", key_type, key_schema), ("value", value_type, value_schema)):
            if typ not in ("binary", "string", "json", "avro") + registry_types:
                raise ValueError(f"({id}) {side}_type {typ!r} not supported")
            if typ in ("json", "avro") and schema is None:
                raise ValueError(f"({id}) {side}_type={typ} requires a {side}_schema")
            if typ in registry_types and connection.schema_registry is None:
                # KafkaTopicDataObject.scala:151-152
                raise ValueError(
                    f"({id}) {side}_type={typ} requires schemaRegistry on the connection"
                )
        self.topic_name = topic_name
        self.connection = connection
        self.key_type = key_type
        self.value_type = value_type
        self.key_schema = key_schema
        self.value_schema = value_schema
        self.select_cols = select_cols or ["key", "value"]
        self.date_partition_col = date_partition_col
        self.date_partition_time_format = date_partition_time_format
        self.batch_read_max_offsets_per_task = batch_read_max_offsets_per_task
        self.options = options or {}
        self._incremental_state: str | None = None

    # ------------------------------------------------------------- options
    def batch_reader_options(
        self,
        starting_offsets: str | None = None,
        ending_offsets: str | None = None,
    ) -> dict[str, str]:
        """Option map for a batch offset-window read
        (KafkaTopicDataObject.scala:303-312). endingOffsets are exclusive."""
        opts = {
            "kafka.bootstrap.servers": self.connection.brokers,
            **self.connection.options,
            **self.options,
            "subscribe": self.topic_name,
            "startingOffsets": starting_offsets or "earliest",
            "endingOffsets": ending_offsets or "latest",
        }
        if self.batch_read_max_offsets_per_task is not None:
            # bounds rows per Spark task: huge backlogs split into even chunks
            # (KafkaTopicDataObject.scala:122,270-300). maxOffsetsPerTrigger is
            # a streaming-only option that the batch source ignores — the
            # batch-supported knob is minPartitions, which makes the source
            # subdivide each topic-partition's offset range so no task exceeds
            # ceil(range / minPartitions-share) offsets.
            n = self._min_partitions_for_window(
                opts["startingOffsets"], opts["endingOffsets"]
            )
            if n is not None:
                opts["minPartitions"] = str(n)
        return opts

    def _min_partitions_for_window(
        self, starting_offsets: str, ending_offsets: str
    ) -> int | None:
        """Number of Spark input partitions so each task reads at most
        `batch_read_max_offsets_per_task` offsets, computed from explicit
        JSON offset windows (the incremental-state path always has them).
        For earliest/latest sentinels the window size is broker metadata we
        don't have at plan time — return None and let Spark default to one
        task per topic-partition."""
        try:
            start = json.loads(starting_offsets)
            end = json.loads(ending_offsets)
        except (TypeError, ValueError):
            return None
        total = 0
        for topic, parts in end.items():
            for p, e in parts.items():
                s = start.get(topic, {}).get(p, 0)
                if e >= 0 and e > s:
                    total += e - s
        if total <= 0:
            return None
        max_per_task = self.batch_read_max_offsets_per_task
        return max(1, -(-total // max_per_task))

    def stream_reader_options(self) -> dict[str, str]:
        """Option map for readStream (KafkaTopicDataObject.scala:210-216)."""
        return {
            "kafka.bootstrap.servers": self.connection.brokers,
            **self.connection.options,
            **self.options,
            "subscribe": self.topic_name,
            "startingOffsets": self.options.get("startingOffsets", "earliest"),
        }

    def writer_options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.connection.brokers,
            **self.connection.options,
            "topic": self.topic_name,
        }

    # ------------------------------------------------------------- decode
    def _convert_col(self, col: F.Column, typ: str, schema, subject_type: str = "value") -> F.Column:
        """kafka binary payload → typed column (KafkaTopicDataObject.scala:408-430).

        Registry variants resolve the subject's latest schema on the driver
        (`{topic}-key`/`{topic}-value`, the Confluent TopicNameStrategy) and
        decode distributed: JSON fully JVM-side, Avro via the pure-python
        codec in an Arrow-batched UDF (schema_registry.py module docs)."""
        if typ == "binary":
            return col
        if typ == "string":
            return col.cast("string")
        if typ in ("json_schema_registry", "avro_schema_registry"):
            from smart_data_lake_spark.dataobjects import schema_registry as sr

            client = self.connection.schema_registry_client()
            reg = client.get_latest(f"{self.topic_name}-{subject_type}")
            if typ == "json_schema_registry":
                spark_schema = schema or sr.json_schema_to_spark(json.loads(reg.schema_str))
                return sr.from_confluent_json(col, spark_schema)
            avro_schema = json.loads(reg.schema_str)
            return sr.from_confluent_avro(col, avro_schema)
        if typ == "avro":
            # pyspark ships the from_avro wrapper but the call is lazy — the
            # jar-missing failure would only surface at analysis time, so
            # probe the JVM class eagerly for a clear gate error (same gate
            # as the reference's KafkaAvro types)
            if not _avro_datasource_loaded():
                raise RuntimeError(
                    f"({self.id}) avro decode needs the spark-avro runtime jar "
                    "(spark.jars.packages org.apache.spark:spark-avro_2.13) — "
                    "not loaded in this session"
                )
            from pyspark.sql.avro.functions import from_avro

            return from_avro(col, schema)
        return F.from_json(col.cast("string"), schema)

    def convert_dataframe(self, raw: DataFrame) -> DataFrame:
        """Apply key/value decoding + column selection + optional date
        partition column to a raw kafka-shaped frame. Pure DataFrame logic —
        unit-testable without a broker."""
        df = raw.withColumn("key", self._convert_col(F.col("key"), self.key_type, self.key_schema, "key"))
        df = df.withColumn("value", self._convert_col(F.col("value"), self.value_type, self.value_schema, "value"))
        if self.date_partition_col:
            df = df.withColumn(
                self.date_partition_col,
                F.date_format(F.col("timestamp"), self.date_partition_time_format),
            )
            return df.select(*self.select_cols, self.date_partition_col)
        return df.select(*self.select_cols)

    def prepare_write_dataframe(self, df: DataFrame) -> DataFrame:
        """Project to kafka's (key, value) wire schema; struct values go
        through to_json (KafkaTopicDataObject.scala:360-366)."""
        cols = []
        for side in ("key", "value"):
            if side not in df.columns:
                if side == "key":
                    continue  # key is optional on write
                raise ValueError(f"({self.id}) write requires a 'value' column")
            c = F.col(side)
            if isinstance(df.schema[side].dataType, (T.StructType, T.ArrayType, T.MapType)):
                c = F.to_json(c)
            cols.append(c.cast("string").alias(side))
        return df.select(*cols)

    # ------------------------------------------------------------- IO
    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        starting = self._incremental_state
        raw = (
            spark.read.format("kafka")
            .options(**self.batch_reader_options(starting_offsets=starting))
            .load()
        )
        return self.convert_dataframe(raw)

    def get_streaming_dataframe(self, spark: SparkSession) -> DataFrame:
        raw = spark.readStream.format("kafka").options(**self.stream_reader_options()).load()
        return self.convert_dataframe(raw)

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        out = self.prepare_write_dataframe(df)
        out.write.format("kafka").options(**self.writer_options()).save()
        return {}

    def write_streaming_dataframe(self, df, trigger, checkpoint_location, output_mode, query_name=None):
        out = self.prepare_write_dataframe(df)
        writer = (
            out.writeStream.format("kafka")
            .options(**self.writer_options())
            .option("checkpointLocation", checkpoint_location)
            .outputMode(output_mode)
            .trigger(**trigger)
        )
        if query_name:
            writer = writer.queryName(query_name)
        return writer.start()

    # ------------------------------------------------- incremental state
    def set_state(self, state: str | None) -> None:
        self._incremental_state = state

    def get_state(self) -> str | None:
        return self._incremental_state

    def advance_state_from(self, df: DataFrame) -> str:
        """Next-run startingOffsets from the max offset read per partition
        (offset + 1 — kafka startingOffsets are inclusive). Requires the raw
        partition/offset columns in `df`; an agg-only job (2 tiny columns)."""
        rows = df.groupBy("partition").agg(F.max("offset").alias("max_offset")).collect()
        offsets = {str(r["partition"]): int(r["max_offset"]) + 1 for r in rows}
        state = json.dumps({self.topic_name: offsets}, sort_keys=True)
        self._incremental_state = state
        return state


class KafkaStateIncrementalMode(ExecutionMode):
    """Carry kafka committed offsets between runs
    (KafkaStateIncrementalMode in the reference executionMode family):
    before exec, push the persisted offsets into the topic DO as
    startingOffsets; after exec, read back the advanced offsets into run
    state."""

    def apply(self, spark, input_do, output_do, given_partition_values, state):
        if not isinstance(input_do, KafkaTopicDataObject):
            raise ValueError("KafkaStateIncrementalMode requires a KafkaTopicDataObject input")
        input_do.set_state(state.get("kafka_offsets"))
        return ExecutionModeResult()

    def post_exec(self, spark, input_do, output_do, state):
        if isinstance(input_do, KafkaTopicDataObject):
            new_state = input_do.get_state()
            if new_state:
                state["kafka_offsets"] = new_state
