from .tiktok import transform_tiktok_orders  # noqa: F401
from .shopee import transform_shopee_orders  # noqa: F401
from .misa import transform_misa_sale_orders  # noqa: F401
