"""Contract-query plans — the driver verification surface.

``contract.load_registry()`` imports every query module and returns the
full name → ContractQuery mapping consumed by ``__spark_entry__.py``,
``bench.py`` and the test suite.
"""

from .contract import ContractQuery, load_registry, register

__all__ = ["ContractQuery", "load_registry", "register"]
