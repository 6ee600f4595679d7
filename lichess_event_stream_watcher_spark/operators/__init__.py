from .enrich import enrich_device, enrich_geoip, normalize_user_id, user_to_json  # noqa: F401
