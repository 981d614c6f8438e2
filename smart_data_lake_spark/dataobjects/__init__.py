from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanCreateStreamingDataFrame,
    CanHandlePartitions,
    CanMergeDataFrame,
    CanWriteDataFrame,
    DataObject,
    Table,
)
from smart_data_lake_spark.dataobjects.file import (
    AvroFileDataObject,
    CsvFileDataObject,
    JsonFileDataObject,
    ParquetFileDataObject,
    RawFileDataObject,
    RelaxedCsvFileDataObject,
    SparkFileDataObject,
    XmlFileDataObject,
)
from smart_data_lake_spark.dataobjects.table import (
    DeltaLakeTableDataObject,
    HiveTableDataObject,
    ParquetTableDataObject,
)
from smart_data_lake_spark.dataobjects.jdbc import JdbcTableDataObject
from smart_data_lake_spark.dataobjects.kafka import KafkaConnection, KafkaTopicDataObject
from smart_data_lake_spark.dataobjects.custom import (
    ActionsExporterDataObject,
    CustomDfDataObject,
    CustomFileDataObject,
    DataObjectsExporterDataObject,
    PKViolatorsDataObject,
)
from smart_data_lake_spark.dataobjects.excel import ExcelFileDataObject
from smart_data_lake_spark.dataobjects.iceberg import IcebergTableDataObject
from smart_data_lake_spark.dataobjects.memory import MockDataObject
from smart_data_lake_spark.dataobjects.jms import JmsDataObject
from smart_data_lake_spark.dataobjects.snowflake import SnowflakeConnection, SnowflakeTableDataObject
from smart_data_lake_spark.dataobjects.splunk import SplunkConnection, SplunkDataObject
from smart_data_lake_spark.dataobjects.web import (
    AirbyteDataObject,
    HttpAuthMode,
    ODataDataObject,
    SFtpFileRefDataObject,
    WebserviceFileDataObject,
)

__all__ = [
    "DataObject",
    "Table",
    "CanCreateDataFrame",
    "CanWriteDataFrame",
    "CanCreateStreamingDataFrame",
    "CanMergeDataFrame",
    "CanHandlePartitions",
    "SparkFileDataObject",
    "ParquetFileDataObject",
    "CsvFileDataObject",
    "RelaxedCsvFileDataObject",
    "JsonFileDataObject",
    "AvroFileDataObject",
    "XmlFileDataObject",
    "RawFileDataObject",
    "ParquetTableDataObject",
    "HiveTableDataObject",
    "DeltaLakeTableDataObject",
    "JdbcTableDataObject",
    "KafkaConnection",
    "KafkaTopicDataObject",
    "CustomDfDataObject",
    "CustomFileDataObject",
    "PKViolatorsDataObject",
    "ActionsExporterDataObject",
    "DataObjectsExporterDataObject",
    "MockDataObject",
    "JmsDataObject",
    "SnowflakeConnection",
    "SnowflakeTableDataObject",
    "SplunkConnection",
    "SplunkDataObject",
    "ExcelFileDataObject",
    "IcebergTableDataObject",
    "WebserviceFileDataObject",
    "ODataDataObject",
    "AirbyteDataObject",
    "SFtpFileRefDataObject",
    "HttpAuthMode",
]
