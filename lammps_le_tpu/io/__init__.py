from .data import DataFile, read_data, system_from_data, write_data  # noqa: F401
