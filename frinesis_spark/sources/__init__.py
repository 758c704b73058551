"""Sources: ingest connectors (Kinesis shard reader)."""
