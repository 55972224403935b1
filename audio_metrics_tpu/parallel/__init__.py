from .pipeline import embedding_pipeline, ItemCategory
from .shuffle import shuffle_stream
from .mesh import make_mesh, batch_sharding, replicated_sharding, DATA_AXIS

__all__ = [
    "embedding_pipeline",
    "ItemCategory",
    "shuffle_stream",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "DATA_AXIS",
]

from .stream import cpu_parallel, device_map_stream  # noqa: E402

__all__ += ["cpu_parallel", "device_map_stream"]
