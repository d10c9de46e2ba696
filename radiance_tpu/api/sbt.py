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
        record index can be selected by `key`, blending by mask.

        This is the wavefront form of the reference's generated switch
        (genSBT.py:18-41): XLA's static shapes rule out true dynamic-size
        per-segment queues, so instead (a) each shader is skipped as a
        whole via lax.cond when no lane selects it -- the common case
        when a pipeline's records partition the wavefront -- and (b) the
        dispatch mask rides into the shader as ctx.active so its inner
        occlusion traces park dead lanes (see pathtracer._PARK_ORIGIN).
        """
        import jax

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
            ctx_m = ctx.replace(active=mask)

            def run(cur, fn=fn, mask=mask, ctx_m=ctx_m):
                new = fn(ctx_m, cur)
                m1 = mask[:, None]
                return cur.replace(
                    color=jnp.where(m1, new.color, cur.color),
                    hit=jnp.where(mask, new.hit, cur.hit),
                    next_factor=jnp.where(m1, new.next_factor,
                                          cur.next_factor),
                    next_origin=jnp.where(m1, new.next_origin,
                                          cur.next_origin),
                    next_dir=jnp.where(m1, new.next_dir, cur.next_dir),
                )

            out = jax.lax.cond(jnp.any(mask), run, lambda cur: cur, out)
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
        """True if any record registers an any-hit shader."""
        for rec in self.records:
            if rec.any_hit:
                return True
        return False

    def make_any_hit_program(self, sbt_record_offset: int, res):
        """Build the callAnyHit dispatch for traversal (shader.cl:574-583).

        Any-hit shader callables have the signature
        (cand: ops.traversal.AnyHitCandidates, res) -> (accept, terminate)
        with [N, W] bool results -- see AnyHitCandidates for semantics.
        Candidates whose record key matches no any-hit record are
        accepted without terminating (plain closest-hit behavior).

        Returns None when every reachable any-hit shader is the canonical
        terminate-on-first (marked `terminate_on_first = True`, the
        reference's anyShadow): callers then use the traversal's cheap
        built-in any_hit_terminate flag instead, which is semantically
        identical and skips the per-leaf shader evaluation.
        """
        entries = []
        nontrivial = False
        for index, rec in enumerate(self.records):
            if not rec.any_hit:
                continue
            fn = self.shaders.get(rec.any_hit)
            if fn is None:
                raise KeyError(f"SBT record {index} references unregistered "
                               f"any-hit shader {rec.any_hit!r}")
            entries.append((index, fn))
            if not getattr(fn, "terminate_on_first", False):
                nontrivial = True
        if not entries or not nontrivial:
            return None

        def program(cand):
            accept = jnp.ones_like(cand.valid)
            term = jnp.zeros_like(cand.valid)
            key = cand.sbt_offset + sbt_record_offset          # [N]
            for index, fn in entries:
                a, t = fn(cand, res)
                m = (key == index)[:, None]
                accept = jnp.where(m, a, accept)
                term = jnp.where(m, t, term)
            return accept, term

        return program
