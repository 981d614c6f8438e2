from smart_data_lake_spark.actions.base import Action, DataFrameAction, NoDataToProcessWarning
from smart_data_lake_spark.actions.copy import CopyAction
from smart_data_lake_spark.actions.custom import CustomDataFrameAction
from smart_data_lake_spark.actions.deduplicate import DeduplicateAction
from smart_data_lake_spark.actions.historize import HistorizeAction
from smart_data_lake_spark.actions.filetransfer import FileTransferAction
from smart_data_lake_spark.actions.customfile import CustomFileAction
from smart_data_lake_spark.actions.script import CustomScriptAction

__all__ = [
    "Action",
    "DataFrameAction",
    "NoDataToProcessWarning",
    "CopyAction",
    "CustomDataFrameAction",
    "DeduplicateAction",
    "HistorizeAction",
    "FileTransferAction",
    "CustomFileAction",
    "CustomScriptAction",
]
