from . import poc_analysis, tpch  # noqa: F401
