from .mesh import (  # noqa: F401
    make_mesh, sharded_pipeline_step, batch_embed_sharded,
)
