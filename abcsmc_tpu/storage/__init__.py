from abcsmc_tpu.storage.base import GenerationData, Storage
from abcsmc_tpu.storage.memstore import MemoryStorage
from abcsmc_tpu.storage.sqlite_store import SQLiteStorage

__all__ = ["GenerationData", "Storage", "MemoryStorage", "SQLiteStorage"]
