"""Class-based schema DSL sugar.

Parity for the reference's ``use_schema`` macro (``/root/reference/lib/
sinter/schema.ex:216-265``) — which reduces to ``define/2`` — as a
Python class decorator reducing to :meth:`Schema.define` (the One True
Way, ``schema.ex:5-7``)::

    @use_schema
    class UserSchema:
        '''User account'''
        name = field("string", min_length=2)
        age = field("integer", optional=True, gt=0)
        __strict__ = True

    UserSchema  # is a Schema instance
"""

from __future__ import annotations

from typing import Any

from .schema import Schema


class _FieldSpec:
    __slots__ = ("type", "opts")

    def __init__(self, type_spec: Any, **opts):
        self.type = type_spec
        self.opts = opts


def field(type_spec: Any, **opts) -> _FieldSpec:
    """Declare a field inside a ``@use_schema`` class body."""
    return _FieldSpec(type_spec, **opts)


def use_schema(cls) -> Schema:
    """Reduce a class body of ``field(...)`` declarations to a Schema."""
    specs = []
    for name, value in vars(cls).items():
        if isinstance(value, _FieldSpec):
            specs.append((name, value.type, value.opts))
    return Schema.define(
        specs,
        title=getattr(cls, "__title__", cls.__name__),
        description=(cls.__doc__ or "").strip() or None,
        strict=getattr(cls, "__strict__", False),
        post_validate=getattr(cls, "__post_validate__", None),
        pre_validate=getattr(cls, "__pre_validate__", None),
    )
