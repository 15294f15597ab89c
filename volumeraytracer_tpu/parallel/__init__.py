"""Multi-device sharding: meshes, pjit/shard_map tracing, brick sharding."""
