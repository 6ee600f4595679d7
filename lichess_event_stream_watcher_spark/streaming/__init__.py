from .source import parse_signup_lines, read_ndjson_batch, read_ndjson_stream  # noqa: F401
from .runner import run_engine_stream  # noqa: F401
from .watchdog import Watchdog  # noqa: F401
