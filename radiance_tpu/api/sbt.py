"""Shader binding table: record specs + dispatch tables.

Accepts the reference's sbt.json schema (reference: samples/sbt.json,
tools/genSBT.py): an array of records {raygen, closestHit, anyHit, miss}
where the record *index* is the dispatch key.  The reference's generated
switch statements (genSBT.py:18-41, shader.cl:574-605) become masked
wavefront dispatch over registered Python shader callables:

  closest-hit key = instanceSBTOffset + sbtRecordOffset (shader.cl:588)
  miss key        = missIndex (shader.cl:600)

Shader callables take (ctx: ShadeContext, payload: Payload) and return a
new Payload; they are evaluated on the full wavefront and blended by the
dispatch mask, so every shader must be total (no data-dependent Python
control flow).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp


@dataclasses.dataclass
class SBTRecord:
    raygen: str = ""
    closest_hit: str = ""
    any_hit: str = ""
    miss: str = ""


@dataclasses.dataclass
class ShaderBindingTable:
    """Records + name->callable registry."""
    records: List[SBTRecord]
    shaders: Dict[str, Callable]

    @staticmethod
    def from_json(path_or_list, shaders: Dict[str, Callable]) -> "ShaderBindingTable":
        """Load the reference's sbt.json format (samples/sbt.json)."""
        if isinstance(path_or_list, str):
            with open(path_or_list) as f:
                data = json.load(f)
        else:
            data = path_or_list
        records = [
            SBTRecord(raygen=r.get("raygen", ""),
                      closest_hit=r.get("closestHit", ""),
                      any_hit=r.get("anyHit", ""),
                      miss=r.get("miss", ""))
            for r in data
        ]
        return ShaderBindingTable(records=records, shaders=shaders)

    def _dispatch(self, kind: str, key, ctx, payload, active):
        """Masked dispatch: run every registered shader of `kind` whose
        record index can be selected by `key`, blending by mask."""
        out = payload
        for index, rec in enumerate(self.records):
            name = getattr(rec, kind)
            if not name:
                continue
            fn = self.shaders.get(name)
            if fn is None:
                raise KeyError(f"SBT record {index} references unregistered "
                               f"shader {name!r}")
            mask = active & (key == index)
            new = fn(ctx, out)
            m1 = mask[:, None]
            out = out.replace(
                color=jnp.where(m1, new.color, out.color),
                hit=jnp.where(mask, new.hit, out.hit),
                next_factor=jnp.where(m1, new.next_factor, out.next_factor),
                next_origin=jnp.where(m1, new.next_origin, out.next_origin),
                next_dir=jnp.where(m1, new.next_dir, out.next_dir),
            )
        return out

    def call_hit(self, sbt_record_offset, ctx, payload, active):
        """callHit switch (shader.cl:585-594)."""
        key = ctx.sbt_offset + sbt_record_offset
        return self._dispatch("closest_hit", key, ctx, payload, active)

    def call_miss(self, miss_index: int, ctx, payload, active):
        """callMiss switch (shader.cl:597-605)."""
        key = jnp.full_like(ctx.sbt_offset, miss_index)
        return self._dispatch("miss", key, ctx, payload, active)

    def has_any_hit(self, sbt_record_offset: int) -> bool:
        """True if any record reachable at this offset registers an any-hit
        shader.  The built-in any-hit semantics are terminate-on-first-hit
        (the reference's anyShadow, shader.cl:567-572); custom any-hit
        programs beyond termination are not yet supported."""
        for rec in self.records:
            if rec.any_hit:
                return True
        return False
