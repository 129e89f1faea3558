"""LM evaluation utilities (perplexity / loglikelihood scoring).

Capability match for /root/reference/mamba/evals/lm_harness_eval.py (a thin
lm-eval-harness adapter). The harness package isn't in this environment, so
this module provides the two primitives such adapters need — batched
next-token loglikelihood and greedy continuation — usable directly or from
a future harness shim.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def sequence_loglikelihood(model, params, input_ids: jax.Array,
                           target_mask: jax.Array) -> jax.Array:
    """Sum log p(token_t | tokens_<t) over positions where target_mask=1.

    input_ids (B, L) int; target_mask (B, L) — 1 marks continuation tokens
    to score. Returns (B,) log-likelihoods.
    """
    logits = model.apply(params, input_ids)          # (B, L, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # logits at t predict token t+1
    next_tok = input_ids[:, 1:]
    tok_logp = jnp.take_along_axis(
        logp[:, :-1], next_tok[..., None], axis=-1
    )[..., 0]
    return jnp.sum(tok_logp * target_mask[:, 1:], axis=-1)


def perplexity(model, params, input_ids: jax.Array) -> float:
    mask = jnp.ones_like(input_ids, jnp.float32)
    ll = sequence_loglikelihood(model, params, input_ids, mask)
    n_tokens = (input_ids.shape[1] - 1) * input_ids.shape[0]
    return float(jnp.exp(-jnp.sum(ll) / n_tokens))


class MambaHarnessLM:
    """lm-eval-harness–shaped adapter over the jitted primitives above.

    The shape of /root/reference/mamba/evals/lm_harness_eval.py:14-36 (an
    HFLM subclass): here the three request-level entry points the harness
    API requires are implemented directly — ``loglikelihood``,
    ``loglikelihood_rolling``, ``generate_until`` — each taking harness
    ``Instance``-likes whose ``.args`` match the harness contract. When the
    ``lm_eval`` package is importable, ``register()`` registers this class
    under the model name "mamba"; otherwise the class still works standalone
    (duck-typed; exercised by tests/test_lm_eval.py with a fake tokenizer).

    tokenizer: any object with ``encode(str) -> List[int]`` and
    ``decode(List[int]) -> str`` (the harness passes an HF AutoTokenizer).
    """

    def __init__(self, model, params, tokenizer, max_length: int = 2048,
                 batch_size: int = 8, eot_token_id: int = 0):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self.eot_token_id = eot_token_id
        self._ll_fn = jax.jit(
            lambda p, ids, m: sequence_loglikelihood(model, p, ids, m))
        self._greedy_fn = None  # built lazily per max_new_tokens

    # -- harness API ------------------------------------------------------

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """requests: Instances with .args == (context, continuation).
        Returns [(loglikelihood, is_greedy)] per request."""
        out = []
        batch: List[Tuple[List[int], List[int]]] = []

        def flush():
            if not batch:
                return
            L = max(len(c) + len(t) for c, t in batch)
            L = min(max(L, 2), self.max_length)
            import numpy as np

            ids_np = np.zeros((len(batch), L), np.int32)
            mask_np = np.zeros((len(batch), L), np.float32)
            for i, (ctx, cont) in enumerate(batch):
                seq = (ctx + cont)[-L:]
                ids_np[i, : len(seq)] = seq
                n_cont = min(len(cont), L)
                mask_np[i, len(seq) - n_cont : len(seq)] = 1.0
            ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)
            lls = self._ll_fn(self.params, ids, mask)
            # is_greedy: whether the continuation equals argmax decoding
            logits = self.model.apply(self.params, ids)
            greedy = jnp.argmax(logits[:, :-1], axis=-1)
            match = jnp.where(
                mask[:, 1:] > 0, greedy == ids[:, 1:], True
            ).all(axis=-1)
            for ll, g in zip(lls, match):
                out.append((float(ll), bool(g)))
            batch.clear()

        for req in requests:
            ctx, cont = req.args if hasattr(req, "args") else req
            ctx_ids = self.tokenizer.encode(ctx) if ctx else [self.eot_token_id]
            cont_ids = self.tokenizer.encode(cont)
            batch.append((ctx_ids, cont_ids))
            if len(batch) == self.batch_size:
                flush()
        flush()
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        """requests: Instances with .args == (string,). Full-sequence
        loglikelihood with a BOS/EOT prefix."""
        reqs = [(("",) + tuple(r.args if hasattr(r, "args") else r))[-1]
                for r in requests]
        insts = [type("I", (), {"args": ("", s)})() for s in reqs]
        return [ll for ll, _ in self.loglikelihood(insts)]

    def generate_until(self, requests) -> List[str]:
        """requests: Instances with .args == (context, gen_kwargs) where
        gen_kwargs may hold 'until' (stop strings) and 'max_gen_toks'."""
        from .generation import GenerationConfig, generate

        outs = []
        for req in requests:
            ctx, kw = req.args if hasattr(req, "args") else req
            kw = kw or {}
            until = kw.get("until", [])
            max_new = int(kw.get("max_gen_toks", 32))
            ctx_ids = self.tokenizer.encode(ctx) or [self.eot_token_id]
            ids = jnp.asarray([ctx_ids], jnp.int32)
            cfg = GenerationConfig(max_length=len(ctx_ids) + max_new, top_k=1)
            toks = generate(self.model, self.params, ids, cfg)
            text = self.tokenizer.decode(
                [int(t) for t in toks[0, len(ctx_ids):]])
            for stop in until:
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
            outs.append(text)
        return outs


def register():
    """Register MambaHarnessLM with lm-eval-harness under "mamba"
    (lm_harness_eval.py:14's @register_model), when the package exists."""
    try:
        from lm_eval.api.model import LM  # type: ignore  # noqa: F401
        from lm_eval.api.registry import register_model  # type: ignore
    except Exception:  # pragma: no cover - harness not installed here
        return False
    register_model("mamba")(MambaHarnessLM)
    return True
