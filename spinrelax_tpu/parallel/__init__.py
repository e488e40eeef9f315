from . import ingest, mesh, pipeline, streamed  # noqa: F401
