from .compiler import CompiledFilter, compile_filter  # noqa: F401
