"""Sinks: the Kinesis batched-egress port of the reference library."""
