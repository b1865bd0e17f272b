"""Multi-chip parallelism: device meshes, tile sharding, spp-allreduce."""
