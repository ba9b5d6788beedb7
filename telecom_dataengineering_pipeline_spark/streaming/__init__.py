from .fraud import fraud_alerts_stream, FraudConfig
from .ingest import bronze_ingest_stream, events_file_stream
from .joins import interval_join_streams

__all__ = [
    "fraud_alerts_stream",
    "FraudConfig",
    "bronze_ingest_stream",
    "events_file_stream",
    "interval_join_streams",
]
