"""Host-side storage layer.

Replaces the reference's sled-backed stores (storage.rs BasicVectorStore,
advanced_storage.rs AdvancedStorage): payloads/documents live host-side in a
WAL + snapshot store; dense vectors live on device (index layer) with the store
as the durable source of truth for rebuilds.
"""

from grape_vector_db_tpu.storage.store import DocumentStore, MemoryDocumentStore, StorageStats
from grape_vector_db_tpu.storage.file import FileDocumentStore

__all__ = ["DocumentStore", "MemoryDocumentStore", "FileDocumentStore", "StorageStats"]
