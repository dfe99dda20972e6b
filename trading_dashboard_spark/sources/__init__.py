from .rest import fetch_quotes_distributed, RateLimit  # noqa: F401
from .landing import write_landing_json  # noqa: F401
