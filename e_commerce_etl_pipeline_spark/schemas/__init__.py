from .tiktok import TIKTOK_ORDER_SCHEMA  # noqa: F401
from .shopee import SHOPEE_ORDER_SCHEMA  # noqa: F401
from .misa import MISA_SALE_ORDER_SCHEMA  # noqa: F401
