from sparf_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    set_active_mesh,
    active_mesh,
    shard_rays,
    replicate_tree,
)
