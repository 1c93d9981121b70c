"""Codec pipelines ("model families"): rzip matcher + backend methods."""
