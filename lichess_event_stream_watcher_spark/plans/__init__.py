from .compile import compile_matches, criterion_to_column, rule_predicate  # noqa: F401
