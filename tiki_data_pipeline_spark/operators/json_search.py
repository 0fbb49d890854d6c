"""S3 — recursive JSON product-list search (__NEXT_DATA__ descent).

Reference: ``src/pipelines/crawl/crawl_products.py:424-560``
(``parse_products_from_next_data`` / ``find_products_in_dict``). The
reference walks an arbitrarily-nested Next.js JSON payload looking for
the FIRST plausible product list, with a fixed key-priority order, then
extracts a normalized product record per item.

Semantics replicated exactly (priority order matters — a payload can
contain several candidate lists and the reference returns the first in
traversal order):

- dict: ``products`` (any list) wins; else ``items`` IF its first
  element is a dict containing any of ``id/product_id/name/price``;
  else recurse into ``data``, ``props``, ``pageProps``,
  ``initialState`` in that order; else recurse every value in key
  insertion order.
- list: return it if its first element is a product-like dict (same
  heuristic); else recurse elements in order.
- Per item: ``product_id`` = first truthy of id/product_id/sku
  (stringified; items without one are skipped), ``name`` = first
  truthy of name/title (items without one are skipped), ``url`` =
  url/link with an ``https://tiki.vn/p/{id}`` fallback when missing or
  not http-prefixed, ``sales_count_raw`` = first truthy of the
  reference's nine sales-count keys (parsed downstream by the shared
  ``parse_sales_count``), and ``image_url`` — which, faithfully to the
  reference's operator precedence (crawl_products.py:520-526), is ''
  whenever ``images`` is not a list, even if an ``image_url`` key
  exists.

Spark shape: one Arrow-batched ``mapInPandas`` pass (the payloads are
opaque JSON strings; this is the U3 batched-map path — there is no
declarative recursive-JSON operator to push this into), emitting one
row per extracted product. Stateless per-row work → embarrassingly
parallel at any scale.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

_PRODUCT_KEYS = ("id", "product_id", "name", "price")
_DESCEND_KEYS = ("data", "props", "pageProps", "initialState")
_SALES_KEYS = (
    "sales_count",
    "quantity_sold",
    "sold_count",
    "total_sold",
    "order_count",
    "sales_quantity",
    "quantity",
    "sold",
    "total_quantity_sold",
)


def find_product_list(obj: Any) -> list | None:
    """The reference's ``find_products_in_dict`` traversal, verbatim
    semantics (crawl_products.py:445-521)."""
    if isinstance(obj, dict):
        if isinstance(obj.get("products"), list):
            return obj["products"]
        items = obj.get("items")
        if (
            isinstance(items, list)
            and items
            and isinstance(items[0], dict)
            and any(k in items[0] for k in _PRODUCT_KEYS)
        ):
            return items
        for key in _DESCEND_KEYS:
            if key in obj:
                result = find_product_list(obj[key])
                if result:
                    return result
        for value in obj.values():
            result = find_product_list(value)
            if result:
                return result
    elif isinstance(obj, list):
        if obj and isinstance(obj[0], dict) and any(
            k in obj[0] for k in _PRODUCT_KEYS
        ):
            return obj
        for item in obj:
            result = find_product_list(item)
            if result:
                return result
    return None


def extract_products(payload: str) -> list[dict]:
    """Parse one JSON payload → list of normalized product records
    (crawl_products.py:523-560 extraction rules)."""
    try:
        data = json.loads(payload)
        product_list = find_product_list(data)
    except (TypeError, ValueError, RecursionError):
        # the reference's outer `except Exception: pass`
        # (crawl_products.py:556-557): a malformed or pathologically
        # deep payload yields no products, never a crashed task
        return []
    if not product_list:
        return []
    out = []
    for item in product_list:
        try:
            product_id = str(item.get("id") or item.get("product_id") or item.get("sku") or "")
            if not product_id:
                continue
            name = item.get("name") or item.get("title") or ""
            url = item.get("url") or item.get("link") or ""
            if not url or not url.startswith("http"):
                url = f"https://tiki.vn/p/{product_id}"
            # Reference operator-precedence quirk preserved: the whole
            # or-chain is conditional on images being a list. An EMPTY
            # images list raises IndexError here and the per-item
            # except drops the product — also reference behavior
            # (crawl_products.py:521-555 wraps the same expression in
            # `except Exception: continue`), kept for output parity.
            image_url = (
                item.get("image_url")
                or item.get("thumbnail_url")
                or item.get("images", [{}])[0].get("url", "")
                if isinstance(item.get("images"), list)
                else ""
            )
            raw = None
            for k in _SALES_KEYS:
                if item.get(k):
                    raw = item[k]
                    break
            if name:
                out.append(
                    {
                        "product_id": product_id,
                        "name": str(name),
                        "url": str(url),
                        "image_url": str(image_url),
                        "sales_count_raw": None if raw is None else str(raw),
                    }
                )
        except (AttributeError, IndexError, TypeError):
            continue
    return out


def search_products(
    envelopes: DataFrame, json_col: str = "next_data", id_col: str = "envelope_id"
) -> DataFrame:
    """(id_col, product_id, name, url, image_url, sales_count_raw) —
    one row per product found by the recursive descent, in list order."""
    import pandas as pd

    out_schema = (
        f"{id_col} int, product_id string, name string, url string,"
        " image_url string, sales_count_raw string"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for env_id, payload in zip(pdf[id_col], pdf[json_col]):
                for rec in extract_products(payload):
                    rows.append({id_col: env_id, **rec})
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "product_id",
                    "name",
                    "url",
                    "image_url",
                    "sales_count_raw",
                ],
            )

    return envelopes.select(id_col, json_col).mapInPandas(run, schema=out_schema)
