from . import gnn, import_torch  # noqa: F401
from .gnn import MODEL_REGISTRY  # noqa: F401
