from .engine import SyncEngine, SyncResult
from .merge import merge_upsert

__all__ = ["SyncEngine", "SyncResult", "merge_upsert"]
