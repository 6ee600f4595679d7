from .command import ParseError, parse_command  # noqa: F401
