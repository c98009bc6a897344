from . import csv_sources, http_source, watermark  # noqa: F401
