from .sharded import ShardedContext, make_device_mesh

__all__ = ["ShardedContext", "make_device_mesh"]
