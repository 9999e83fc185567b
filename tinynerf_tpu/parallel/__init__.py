"""Mesh/sharding utilities: data-parallel ray batches over TPU meshes."""
