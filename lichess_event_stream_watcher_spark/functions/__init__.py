from .ip import ip_to_num, is_in_ip_range  # noqa: F401
