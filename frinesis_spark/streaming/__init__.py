"""Structured Streaming layer: event-time windows, watermarks, stateful
dedup — plus the batch-equivalent forms used for oracle checking."""
