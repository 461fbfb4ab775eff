from .api_adapter import PaginatedApiSource, PageSpec  # noqa: F401
from .auth import hmac_sha256_signature, jwt_expiry, TokenCache, TokenStore  # noqa: F401
