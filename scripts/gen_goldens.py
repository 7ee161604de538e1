"""Generate golden-output YAML cases from HF torch (the independent oracle).

Counterpart of the reference's per-model golden case files (reference:
integration_tests/test_cases_gpt2.yaml, test_cases_bloom560m.yaml), in the
same shape: a list of {name, request, response} where request/response are
the fmaas JSON encodings. Expected text/logprobs/ranks come from a torch
forward/greedy loop over the SAME checkpoint + real tokenizer.json, so any
weight-mapping, tokenizer, or sampling-semantics regression in the serving
stack shows up as a mismatch (tests/test_golden.py).

Regenerate after changing the fixture checkpoints:
    PYTHONPATH=/root/repo python scripts/gen_goldens.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import torch
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests import fixtures  # noqa: E402

OUT_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden"

PROMPTS = [
    "hello world this is a test",
    "the quick brown fox",
    "café naïve — üöä",
]


def _tok(model_dir):
    from tokenizers import Tokenizer

    return Tokenizer.from_file(str(Path(model_dir) / "tokenizer.json"))


def _special_ids(tok):
    out = set()
    for t in ("<unk>", "<s>", "</s>", "<|endoftext|>", "[UNK]", "[CLS]",
              "[SEP]"):
        tid = tok.token_to_id(t)
        if tid is not None:
            out.add(tid)
    return out


class HFGreedy:
    """Greedy generation + per-token details straight from torch."""

    def __init__(self, model, tok, eos_id, special_ids):
        self.model = model
        self.tok = tok
        self.eos_id = eos_id
        self.special_ids = special_ids

    def _decode(self, ids):
        keep = [i for i in ids if i not in self.special_ids]
        return self.tok.decode(keep) if keep else ""

    def step_logits(self, ids):
        with torch.no_grad():
            out = self.model(input_ids=torch.tensor([ids]))
        return out.logits[0, -1].float()

    def run(self, prompt_ids, max_new, min_new=0, stop_seqs=(),
            include_stop=True):
        """Returns dict with text, token ids, logprobs, ranks, top2,
        stop_reason, generated count — mirroring server-side semantics."""
        from text_generation_inference_tpu.utils.detokenizer import (
            StopSequenceState)

        ids = list(prompt_ids)
        gen, lps, ranks, top2 = [], [], [], []
        stop_state = StopSequenceState(list(stop_seqs), include_stop)
        matched = None
        reason = "MAX_TOKENS"
        prev_text = ""
        while len(gen) < max_new:
            logits = self.step_logits(ids)
            nxt = int(torch.argmax(logits).item())
            lp = torch.log_softmax(logits, dim=-1)
            lps.append(float(lp[nxt]))
            ranks.append(int((logits > logits[nxt]).sum().item()) + 1)
            ts, ti = torch.topk(logits, 2)
            top2.append([(int(i), float(lp[i])) for i in ti])
            ids.append(nxt)
            gen.append(nxt)
            # incremental delta via full-prefix decode diff (real tokenizer)
            text = self._decode(gen)
            delta = text[len(prev_text):] if text.startswith(prev_text) \
                else text
            prev_text = text
            m = stop_state.feed(delta) if delta else None
            # stopping order: min_new -> EOS -> max_new -> stop sequence
            if len(gen) >= min_new and nxt == self.eos_id:
                reason = "EOS_TOKEN"
                break
            if len(gen) >= max_new:
                reason = "MAX_TOKENS"
                break
            if m is not None and len(gen) >= min_new:
                reason = "STOP_SEQUENCE"
                matched = m
                break
        final_text = stop_state.final_text(matched)
        return {
            "text": final_text,
            "ids": gen,
            "logprobs": lps,
            "ranks": ranks,
            "top2": top2,
            "reason": reason,
            "matched": matched,
        }


def _resp_entry(run, input_count, details=False, top_n=0):
    entry = {
        "generatedTokenCount": len(run["ids"]),
        "inputTokenCount": input_count,
        "stopReason": run["reason"],
    }
    if run["text"]:
        entry["text"] = run["text"]
    if run["reason"] == "STOP_SEQUENCE" and run["matched"]:
        entry["stopSequence"] = run["matched"][0]
    if details:
        toks = []
        for i, tid in enumerate(run["ids"]):
            t = {"text": "id:%d" % tid, "logprob": run["logprobs"][i]}
            if top_n:
                t["topTokens"] = [
                    {"text": "id:%d" % cid, "logprob": clp}
                    for cid, clp in run["top2"][:][i][:top_n]]
            toks.append(t)
        entry["tokens"] = toks
    return entry


def gen_decoder_cases(model_dir, family):
    from transformers import AutoModelForCausalLM

    tok = _tok(model_dir)
    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    eos = cfg.get("eos_token_id")
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    hf = HFGreedy(model, tok, eos, _special_ids(tok))

    def enc(text):
        return tok.encode(text).ids

    cases = []

    # 1. implicit default max_new_tokens (20)
    p = enc(PROMPTS[0])
    run = hf.run(p, max_new=20)
    cases.append({
        "name": "Basic greedy, implicit max new tokens",
        "request": {"requests": [{"text": PROMPTS[0]}]},
        "response": {"responses": [_resp_entry(run, len(p))]},
    })

    # 2. explicit max_new_tokens, all prompts (batch)
    runs = [(pr, hf.run(enc(pr), max_new=8)) for pr in PROMPTS]
    cases.append({
        "name": "Batch greedy, explicit max new tokens",
        "request": {
            "params": {"method": "GREEDY",
                       "stopping": {"maxNewTokens": 8}},
            "requests": [{"text": pr} for pr in PROMPTS],
        },
        "response": {"responses": [
            _resp_entry(r, len(enc(pr))) for pr, r in runs]},
    })

    # 3. token details (logprobs + ranks)
    p = enc(PROMPTS[1])
    run = hf.run(p, max_new=4)
    entry = {
        "generatedTokenCount": len(run["ids"]),
        "inputTokenCount": len(p),
        "stopReason": run["reason"],
        "tokens": [
            {"logprob": run["logprobs"][i], "rank": run["ranks"][i]}
            for i in range(len(run["ids"]))],
    }
    if run["text"]:
        entry["text"] = run["text"]
    cases.append({
        "name": "Token details",
        "request": {
            "params": {
                "method": "GREEDY",
                "stopping": {"maxNewTokens": 4},
                "response": {"generatedTokens": True,
                             "tokenLogprobs": True, "tokenRanks": True},
            },
            "requests": [{"text": PROMPTS[1]}],
        },
        "response": {"responses": [entry]},
    })

    # 4. stop sequence carved from case-1 text (excluded + included)
    base = hf.run(enc(PROMPTS[0]), max_new=20)
    if len(base["text"]) >= 6:
        carved = base["text"][2:5]
        for include in (False, True):
            run = hf.run(enc(PROMPTS[0]), max_new=20,
                         stop_seqs=[carved], include_stop=include)
            cases.append({
                "name": f"Stop sequence include={include}",
                "request": {
                    "params": {"stopping": {
                        "maxNewTokens": 20,
                        "stopSequences": [carved],
                        "includeStopSequence": include}},
                    "requests": [{"text": PROMPTS[0]}],
                },
                "response": {"responses": [_resp_entry(run, len(enc(PROMPTS[0])))]},
            })

    return cases


def gen_t5_cases(model_dir):
    # AutoModel resolves model_type (t5 AND mt5/mt0; reference
    # integration-tests mt0-small: integration_tests/test_server.py:48-64)
    from transformers import AutoModelForSeq2SeqLM

    tok = _tok(model_dir)
    cfg = json.loads((Path(model_dir) / "config.json").read_text())
    eos = cfg.get("eos_token_id")
    start = cfg.get("decoder_start_token_id")
    model = AutoModelForSeq2SeqLM.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    specials = _special_ids(tok)

    def enc(text):
        # no post-processor in the fixture tokenizer.json: the server does
        # not append </s> to encoder input, so neither does the oracle
        return tok.encode(text).ids

    def dec(ids):
        keep = [i for i in ids if i not in specials and i != start]
        return tok.decode(keep) if keep else ""

    def greedy(enc_ids, max_new):
        dec_ids = [start]
        gen = []
        reason = "MAX_TOKENS"
        with torch.no_grad():
            for _ in range(max_new):
                out = model(
                    input_ids=torch.tensor([enc_ids]),
                    decoder_input_ids=torch.tensor([dec_ids]))
                nxt = int(torch.argmax(out.logits[0, -1]).item())
                dec_ids.append(nxt)
                gen.append(nxt)
                if nxt == eos:
                    reason = "EOS_TOKEN"
                    break
        return {"ids": gen, "text": dec(gen), "reason": reason,
                "matched": None, "logprobs": [], "ranks": [], "top2": []}

    cases = []
    for i, pr in enumerate(PROMPTS[:2]):
        ids = enc(pr)
        run = greedy(ids, 8)
        cases.append({
            "name": f"Seq2seq greedy {i}",
            "request": {
                "params": {"stopping": {"maxNewTokens": 8}},
                "requests": [{"text": pr}],
            },
            "response": {"responses": [_resp_entry(run, len(ids))]},
        })
    return cases


def gen_family(family: str) -> list:
    """Oracle cases for one family, generated in THIS environment.

    The committed YAML snapshots in tests/golden/ are a reference record:
    the fixture checkpoints are seeded-random torch inits, so their exact
    weights (and hence greedy outputs) can shift across torch/tokenizers
    releases. tests/test_golden.py therefore regenerates expectations
    through this function (cached per fixture fingerprint) instead of
    trusting a snapshot from a different environment."""
    if family == "gpt2":
        return gen_decoder_cases(fixtures.golden_gpt2_dir(), "gpt2")
    if family == "llama":
        return gen_decoder_cases(fixtures.golden_llama_dir(), "llama")
    if family == "t5":
        return gen_t5_cases(fixtures.golden_t5_dir())
    if family == "mt0":
        return gen_t5_cases(fixtures.golden_mt0_dir())
    raise ValueError(family)


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for fam in ("gpt2", "llama", "t5", "mt0"):
        cases = gen_family(fam)
        out = OUT_DIR / f"test_cases_{fam}.yaml"
        out.write_text(yaml.safe_dump(cases, allow_unicode=True,
                                      sort_keys=False))
        print(f"{out}: {len(cases)} cases")


if __name__ == "__main__":
    main()
