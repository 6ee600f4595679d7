from .enrich import enrich_device, enrich_geoip, enrich_geoip_banded, normalize_user_id, user_to_json  # noqa: F401
