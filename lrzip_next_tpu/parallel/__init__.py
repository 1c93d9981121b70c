"""Multi-chip / multi-host sharding: mesh setup, block-parallel encode,
ordered gather."""
