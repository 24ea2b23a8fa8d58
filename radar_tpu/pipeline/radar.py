"""The full two-stage RADAR pipeline (reference ``README.md:7-10``):

1. the MLLM stage (our ``ReportDecoder``, image-prefixed) drafts
   *preliminary findings* (PF);
2. the expert model validates observations on the image+context;
3. cross-modal retrieval fetches *supplementary findings* (SF) from
   similar cases (hybrid semantic+observation scoring);
4. iterative RAG regenerates the report with targeted evidence until
   observations are complete/consistent.

The reference never assembles this end-to-end (its MLLM is an injected
mock — SURVEY.md §0.1); here it runs as one object whose compute-heavy
stages are jitted XLA programs and whose string-space loop stays host-
side.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import RadarConfig
from ..core.logging import get_logger
from ..core.constants import OBSERVATION_NAMES
from ..models.decoder import ReportDecoder, generate
from ..pipeline.rag import IterativeRAG
from ..retrieval.dpr import DensePassageRetrieval

logger = get_logger("radar_tpu.pipeline")


def _pinning_property(name: str) -> property:
    """Param-pytree attribute that pins assignments on device.  Orbax
    restores HOST NUMPY, and jit re-uploads numpy args on EVERY call —
    through the TPU relay that re-transfer dominated serving latency
    (~15 s/study at the quality preset for ~0.3 s of compute).  A
    property (not a one-time ``device_put`` in ``__init__``) keeps
    post-construction reassignment (``pipe.decoder_params = …``)
    pinned too.  With a ``serving_mesh`` the pin REPLICATES the params
    over the mesh (data-parallel serving)."""
    attr = "_" + name

    def _get(self):
        return getattr(self, attr)

    def _set(self, p):
        setattr(self, attr, None if p is None else self._pin(p))

    return property(_get, _set)


class RadarPipeline:
    expert_params = _pinning_property("expert_params")
    decoder_params = _pinning_property("decoder_params")
    fusion_params = _pinning_property("fusion_params")
    temporal_params = _pinning_property("temporal_params")

    def __init__(self, config: RadarConfig, tokenizer,
                 expert_model=None, expert_params=None,
                 dpr: DensePassageRetrieval | None = None,
                 decoder: ReportDecoder | None = None,
                 decoder_params=None,
                 fusion_module=None, fusion_params=None,
                 temporal_model=None, temporal_params=None,
                 ring=None, expert_thresholds=None, ensemble=None,
                 serving_mesh=None, stacker=None):
        #: optional (mesh, axis_name): context-parallel ring attention
        #: for decoder prefills (long-context serving over ICI)
        self.ring = ring
        # data-parallel serving (set BEFORE any param assignment — the
        # pinning properties consult these): params replicate over the
        # mesh, batch-dim inputs shard along ``axis``, and every jitted
        # stage compiles to ONE SPMD program spanning all mesh devices
        # (XLA inserts no collectives for inference — rows are
        # independent — so DP serving scales with chips over ICI).
        # ``serving_mesh``: a Mesh or (mesh, axis_name).
        self._rep_sharding = None
        self._batch_sharding = None
        self._mesh_size = 1
        if serving_mesh is not None:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            if isinstance(serving_mesh, tuple):
                mesh, axis = serving_mesh
            else:
                mesh, axis = serving_mesh, serving_mesh.axis_names[0]
            if ring is not None:
                raise ValueError(
                    "serving_mesh and ring (context parallelism) place "
                    "arrays on different device sets — use one or the "
                    "other per pipeline")
            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh,
                                                 PartitionSpec(axis))
            self._mesh_size = int(mesh.shape[axis])
        #: per-class decision thresholds from the trainer's val-fitted
        #: calibration.json (uncertainty experts carry theirs in-params)
        self.expert_thresholds = (np.asarray(expert_thresholds,
                                             np.float32)
                                  if expert_thresholds is not None
                                  else None)
        self.config = config
        self.tokenizer = tokenizer
        self.expert_model = expert_model
        self.expert_params = expert_params        # pinning properties
        self.dpr = dpr
        self.decoder = decoder
        self.decoder_params = decoder_params
        self.fusion_module = fusion_module
        self.fusion_params = fusion_params
        self.temporal_model = temporal_model
        self.temporal_params = temporal_params
        self.rag = IterativeRAG(config.rag)
        self._expert_fwd = None
        if expert_model is not None:
            self._expert_fwd = jax.jit(
                lambda p, pv, ids, m: expert_model.apply(
                    {"params": p}, pv, ids, m, deterministic=True))
        #: extra expert members [(model, params, thresholds|None), ...]
        #: for probability-averaged ensembling: confident false
        #: positives of independently-trained experts decorrelate, so
        #: the mean calibrated probability cuts the leak-free
        #: hallucination floor a single expert cannot (round-3: the
        #: residual FP mentions are expert-confident AND neighbour-
        #: supported — only a second expert's dissent catches them)
        self._members = []
        if ensemble and expert_model is None:
            raise ValueError(
                "ensemble members require a lead expert_model (the "
                "fused ensemble forward stacks the lead expert with "
                "the members)")
        for (m_model, m_params, m_th) in (ensemble or []):
            self._members.append((
                m_model,
                None if m_params is None else self._pin(m_params),
                m_th))
        #: optional val-fitted logistic keep-rule (TargetingStacker):
        #: replaces the hand cross-modal veto on expert positives —
        #: +~2pp expected-set micro-F1 over the 0.7/6 rectangle on
        #: held-out leak-free data (results/targeting_stacker_sweep.json)
        self.stacker = stacker
        #: which positive gate actually ran, per call — surfaced in eval
        #: artifacts so an operator can see a silent veto fallback
        #: (advisor round-3): a run with --targeting_stacker can
        #: otherwise report veto numbers unnoticed.
        self.gate_counts = {"stacker": 0, "veto": 0}
        #: per-stage seconds of the most recent generate_reports_batch
        self.last_batch_timings: dict[str, float] = {}
        self._warned_stacker_fallback = False
        if stacker is not None:
            n_mem = 1 + len(self._members)
            if stacker.n_members != n_mem:
                raise ValueError(
                    f"targeting stacker was fitted for "
                    f"{stacker.n_members} ensemble member(s); this "
                    f"pipeline runs {n_mem} — refit with "
                    f"cli/fit_targeting_stacker.py on the serving "
                    f"ensemble")
        # ONE jitted program for all ensemble members' calibrated
        # probabilities: per-member jit calls cost a full dispatch
        # round-trip each through the TPU relay (~90 ms) — at 3
        # members that fixed cost rivals the batch's compute.  The
        # fused program computes every member's temperature-scaled
        # sigmoid in one XLA dispatch; mean/std stay host-side.
        self._ensemble_fwd = None
        if self._members and expert_model is not None:
            member_models = [expert_model] + [m for (m, _, _)
                                              in self._members]

            def _stacked(ps, pv, ids, msk):
                outs = []
                for mdl, p in zip(member_models, ps):
                    logits = mdl.apply({"params": p}, pv, ids, msk,
                                       deterministic=True)
                    if "temperature" in p:
                        logits = logits / jnp.maximum(jnp.asarray(
                            p["temperature"], jnp.float32), 1e-3)
                    outs.append(jax.nn.sigmoid(logits))
                return jnp.stack(outs)          # [M, B, n_obs]

            self._ensemble_fwd = jax.jit(_stacked)
        self._fusion_fwd = None
        if fusion_module is not None:
            self._fusion_fwd = jax.jit(
                lambda p, pf, sf, pm, sm: fusion_module.apply(
                    {"params": p}, pf, sf, pm, sm))
        self._temporal_fwd = None
        if temporal_model is not None:
            self._temporal_fwd = jax.jit(
                lambda p, c, pr: temporal_model.apply(
                    {"params": p}, c, pr)["progression_logits"])

    # ------------------------------------------------------------------
    def _pin(self, p):
        """Device-pin a param pytree: replicated over the serving mesh
        when one is set, else default single-device placement."""
        if self._rep_sharding is not None:
            return jax.device_put(p, self._rep_sharding)
        return jax.device_put(p)

    def _put_batch(self, x):
        """Commit a batch-dim array for the jitted stages: sharded
        along the serving mesh's data axis when one is set (leading dim
        must be mesh-divisible — ``generate_reports_batch`` pads), else
        a plain ``jnp.asarray``.  Host arrays go straight to the
        sharded placement (ONE upload); ``jnp.asarray`` first would
        stage them on the default device and pay a second transfer —
        through the relay that re-transfer class dominates serving
        latency (CLAUDE.md)."""
        if self._batch_sharding is not None:
            if not isinstance(x, jax.Array):
                x = np.asarray(x)
            return jax.device_put(x, self._batch_sharding)
        return jnp.asarray(x)

    def _preprocess_batch(self, images) -> jax.Array:
        """Device-resident normalized image batch from either wire
        format: uint8 [B, H, W, 3] (the production format — 1/4 the
        relay upload bytes) runs the fused on-device resize+scale+
        normalize program (``data/dataset.preprocess_images``);
        float32 input is assumed already normalized and is uploaded
        as-is."""
        x = np.stack([np.asarray(im) for im in images])
        if x.dtype == np.uint8:
            from ..data.dataset import preprocess_images
            return preprocess_images(self._put_batch(x),
                                     self.config.vision.image_size)
        return self._put_batch(x.astype(np.float32, copy=False))

    def _member_params(self) -> tuple:
        """(lead expert params, *ensemble member params) — the
        argument tuple of the fused ``_ensemble_fwd`` program."""
        return (self.expert_params,
                *[m_params for (_, m_params, _) in self._members])

    @staticmethod
    def _member_thresholds(params, thresholds) -> np.ndarray | float:
        """One member's decision thresholds: in-params (uncertainty,
        temperature-calibrated) > calibration.json > 0.5."""
        if params is not None and "thresholds" in params:
            return np.asarray(params["thresholds"])
        if thresholds is not None:
            return np.asarray(thresholds)
        return 0.5

    def _thresholds(self) -> np.ndarray | float:
        """Per-class decision thresholds; with ensemble members the
        mean of the members' calibrated thresholds (each member's
        thresholds live on its own probability scale, so the mean
        threshold matches the mean probability)."""
        th = self._member_thresholds(self.expert_params,
                                     self.expert_thresholds)
        if not self._members:
            return th
        n_obs = len(OBSERVATION_NAMES)
        acc = np.broadcast_to(np.asarray(th, np.float32),
                              (n_obs,)).copy()
        for (_, m_params, m_th) in self._members:
            acc += np.broadcast_to(np.asarray(
                self._member_thresholds(m_params, m_th), np.float32),
                (n_obs,))
        return acc / (1 + len(self._members))

    @staticmethod
    def _calibrated_probs(fwd, params, images, input_ids,
                          attention_mask) -> np.ndarray:
        logits = np.asarray(fwd(params, images, input_ids,
                                attention_mask))
        if "temperature" in params:
            logits = logits / max(
                float(np.asarray(params["temperature"])), 1e-3)
        # host-side sigmoid: the logits are already downloaded, and a
        # device sigmoid would cost an extra upload+dispatch round-trip
        # through the relay on every serving forward
        probs = np.exp(-np.logaddexp(0.0, -logits.astype(np.float64)))
        return probs.astype(np.float32)

    def _expert_probs(self, images, input_ids, attention_mask
                      ) -> np.ndarray:
        """Calibrated expert probabilities for a batch: one jitted
        forward per ensemble member, temperature-scaled when the params
        carry a calibrated temperature (round-2 defect: the batched
        serving path used raw uncalibrated logits at a fixed 0.5,
        severing it from the trainer's calibration).  With ensemble
        members, the mean of the members' calibrated probabilities."""
        return self._expert_prob_stack(images, input_ids,
                                       attention_mask)[0]

    def _expert_prob_stack(self, images, input_ids, attention_mask
                           ) -> tuple[np.ndarray, np.ndarray]:
        """(mean calibrated probs [B, n_obs], member stack [M, B,
        n_obs]) — the stack feeds the targeting stacker's per-member
        features; M=1 for a solo expert."""
        if self._ensemble_fwd is not None:
            stack = np.asarray(self._ensemble_fwd(
                self._member_params(), images, input_ids,
                attention_mask))
            return stack.mean(0), stack
        probs = self._calibrated_probs(
            self._expert_fwd, self.expert_params, images, input_ids,
            attention_mask)
        return probs, probs[None]

    # ------------------------------------------------------------------
    def corroborate_observations(self, image_embeddings: np.ndarray,
                                 probs: np.ndarray,
                                 neighbour_ids: np.ndarray | None = None
                                 ) -> list[set]:
        """Image-neighbour corroboration (round-3, VERDICT r2 #1):
        observations mentioned by >= ``corroborate_min_votes`` of the
        ``corroborate_top_m`` visually-nearest indexed reports, which
        the expert neither confidently asserts (would be redundant) nor
        confidently rejects (prob <= floor), become loop-expected
        candidates.  This is genuinely *new* information for the
        leak-free prompt: the retrieval embedder is an independent
        image->report model, so its neighbour votes have decorrelated
        errors from the expert's — and it flows in through the RAG
        loop's targeted retrieval, not the stage-1 prompt.
        """
        cfg = self.config.rag
        if (self.dpr is None or self.dpr.index.count == 0
                or cfg.corroborate_top_m <= 0):
            return [set() for _ in range(len(image_embeddings))]
        th = self._thresholds()
        th = np.broadcast_to(np.asarray(th, np.float32),
                             probs.shape[-1:])
        if neighbour_ids is not None:
            # precomputed shared search (sorted by score): the top-m
            # slice equals a fresh k=m search
            ids = np.asarray(neighbour_ids)[:, :cfg.corroborate_top_m]
        else:
            _, ids = self.dpr.index.search(
                np.asarray(image_embeddings), cfg.corroborate_top_m)
            ids = np.asarray(ids)
        # vote source: the index's stored multi-hot labels — the SAME
        # quantity the precision sweep (scripts/corroborate_sweep.py)
        # tuned the 10/6/0.35 defaults against and the veto channel
        # reads; text re-detection is only a fallback for indexes
        # built without observation labels (on real corpora the two
        # diverge — a positive label need not be verbatim in the text)
        obs_mat = self._index_observations_host()
        use_stored = obs_mat.size > 0 and bool(obs_mat.any())
        nf = OBSERVATION_NAMES.index("No Finding")
        out = []
        for row in range(len(image_embeddings)):
            votes: dict[str, int] = {}
            valid = ids[row]
            valid = valid[(valid >= 0) & (valid < self.dpr.index.count)]
            if use_stored:
                counts = obs_mat[valid].sum(0)       # [n_obs]
                votes = {OBSERVATION_NAMES[j]: int(counts[j])
                         for j in range(len(OBSERVATION_NAMES))
                         if counts[j] > 0}
            else:
                for pid in valid:
                    if int(pid) >= len(self.dpr.passages):
                        continue
                    for name in self.rag.detector.detect_observations(
                            self.dpr.passages[int(pid)]):
                        votes[name] = votes.get(name, 0) + 1
            cand = set()
            for name, v in votes.items():
                if v < cfg.corroborate_min_votes:
                    continue
                j = self._obs_index(name)
                if j is None or j == nf:
                    continue
                p = float(probs[row, j])
                # expert-gated: skip already-confident and vetoed
                if cfg.corroborate_prob_floor < p <= float(th[j]):
                    cand.add(name)
            out.append(cand)
        return out

    def _index_observations_host(self) -> np.ndarray:
        """Host copy of the index's stored multi-hot observation labels,
        fetched once per (index object, count) — both vote channels read
        it per study, and a device→host pull of the full matrix through
        the relay is pure overhead on an index that never changes
        mid-serving."""
        idx = self.dpr.index
        cached = getattr(self, "_obs_host_cache", None)
        # key on the index OBJECT (not id(): a GC'd index's id can be
        # recycled) + count (the only mutation, `add`, bumps it)
        if (cached is None or cached[0] is not idx
                or cached[1] != idx.count):
            obs = np.asarray(getattr(idx, "observations",
                                     np.zeros((0, 0), np.float32)))
            cached = (idx, idx.count, obs)
            self._obs_host_cache = cached
        return cached[2]

    def _neighbour_votes(self, image_embeddings,
                         neighbour_ids: np.ndarray | None = None
                         ) -> np.ndarray | None:
        """[B, n_obs] image-neighbour observation votes: how many of
        the ``rag.veto_top_m`` visually-nearest indexed reports carry
        each observation, read from the index's stored multi-hot
        labels (``ShardedIndex.observations``).  Returns None when the
        veto is disabled, there is no index, or the index was built
        without observation labels."""
        cfg = self.config.rag
        if (self.dpr is None or image_embeddings is None
                or cfg.veto_top_m <= 0 or self.dpr.index.count == 0):
            return None
        obs = self._index_observations_host()
        if obs.size == 0 or not obs.any():
            return None
        if neighbour_ids is not None:
            ids = np.asarray(neighbour_ids)[:, :cfg.veto_top_m]
        else:
            _, ids = self.dpr.index.search(np.asarray(image_embeddings),
                                           cfg.veto_top_m)
            ids = np.asarray(ids)
        votes = np.zeros((len(ids), obs.shape[1]), np.float32)
        count = self.dpr.index.count
        for r, row in enumerate(ids):
            valid = row[(row >= 0) & (row < count)]
            if len(valid):
                votes[r] = obs[valid].sum(0)
        return votes

    def _apply_veto(self, probs: np.ndarray, decisions: np.ndarray,
                    votes: np.ndarray | None) -> np.ndarray:
        """Cross-modal veto on expert-positive decisions (round-3):
        keep a positive only when the expert is strongly confident OR
        enough visual neighbours corroborate it — the two signals come
        from independently-trained models, so their false positives
        decorrelate.  ``No Finding`` is exempt (it is not a mention
        the decoder can hallucinate)."""
        if votes is None:
            return decisions
        cfg = self.config.rag
        keep = (probs > cfg.veto_prob) | (votes >= cfg.veto_min_votes)
        nf = OBSERVATION_NAMES.index("No Finding")
        keep[:, nf] = True
        return decisions & keep

    def _gate_positives(self, probs: np.ndarray, decisions: np.ndarray,
                        votes: np.ndarray | None,
                        stack: np.ndarray | None = None,
                        nbr_ids: np.ndarray | None = None,
                        nbr_scores: np.ndarray | None = None
                        ) -> np.ndarray:
        """Keep/drop rule on expert-positive decisions: the val-fitted
        logistic keep-rule (``TargetingStacker``) when one is loaded
        AND the neighbour features it was fitted on are available
        (index with stored observation labels, search depth >= 20);
        otherwise the hand cross-modal veto.  The stacker beats the
        0.7/6 rectangle by ~2pp expected-set micro-F1 on held-out
        leak-free splits (results/targeting_stacker_sweep.json)."""
        from .targeting import VOTE_TOP_MS, neighbour_vote_features
        if (self.stacker is not None and stack is not None
                and nbr_ids is not None and nbr_scores is not None
                and nbr_ids.shape[1] >= max(VOTE_TOP_MS)):
            obs_mat = self._index_observations_host()
            if obs_mat.size and obs_mat.any():
                vf = neighbour_vote_features(
                    np.asarray(nbr_ids), np.asarray(nbr_scores),
                    obs_mat, self.dpr.index.count)
                keep = self.stacker.keep_mask(
                    stack, vf["votes10"], vf["votes20"], vf["swv10"],
                    vf["score_stats"])
                self.gate_counts["stacker"] += 1
                return decisions & keep
        if self.stacker is not None and not self._warned_stacker_fallback:
            # loaded stacker silently not running is an operator trap
            self._warned_stacker_fallback = True
            logger.warning(
                "targeting stacker is loaded but its neighbour features "
                "are unavailable (index without stored observation "
                "labels, or search depth < %d) — falling back to the "
                "hand veto; eval artifacts carry gate_counts",
                max(VOTE_TOP_MS))
        self.gate_counts["veto"] += 1
        return self._apply_veto(probs, decisions, votes)

    @staticmethod
    def _obs_index(name: str) -> int | None:
        from .grounding import _ALIAS
        canon = _ALIAS.get(name, name)
        if canon in OBSERVATION_NAMES:
            return OBSERVATION_NAMES.index(canon)
        return None

    def _banned_masks(self, probs: np.ndarray) -> np.ndarray | None:
        """[B, vocab] first-pass constrained-decoding masks: ban the
        name tokens of entities the expert scores at or below the
        hallucination threshold (contribution 3.3 moved INTO the first
        generation pass — round-2 only regenerated post-hoc)."""
        from .grounding import GroundingVerifier
        verifier = GroundingVerifier()
        vocab = self.config.decoder.vocab_size
        masks = np.zeros((probs.shape[0], vocab), bool)
        hit = False
        nf = OBSERVATION_NAMES.index("No Finding")
        for i in range(probs.shape[0]):
            low = [OBSERVATION_NAMES[j]
                   for j in range(len(OBSERVATION_NAMES))
                   if j != nf
                   and probs[i, j] <= verifier.hallucination_threshold]
            if not low:
                continue
            m = verifier.banned_token_mask(self.tokenizer, low,
                                           vocab_size=vocab)
            if m is not None:
                masks[i] = m
                hit = True
        return masks if hit else None

    # ------------------------------------------------------------------
    def compare_with_prior(self, image: np.ndarray,
                           prior_image: np.ndarray) -> dict:
        """Temporal stage (contribution 3.1): per-observation
        progression classes + the structured comparison statement the
        decoder prompt is conditioned on."""
        if self._temporal_fwd is None:
            raise ValueError("pipeline built without a temporal model")
        from ..models.temporal import comparison_statements
        logits = np.asarray(self._temporal_fwd(
            self.temporal_params,
            jnp.asarray(image, jnp.float32)[None],
            jnp.asarray(prior_image, jnp.float32)[None]))[0]
        progression = np.argmax(logits, -1)            # [14]
        return {"progression": progression,
                "statements": comparison_statements(progression)}

    # ------------------------------------------------------------------
    def predict_observations(self, image: np.ndarray,
                             clinical_context: str,
                             threshold: float | None = None,
                             max_uncertainty: float = 0.2,
                             rng: jax.Array | None = None) -> dict:
        """Expert-stage observation probabilities + confident set.

        For an ``UncertaintyExpert`` (detected by its calibrated
        ``temperature``/``thresholds`` params) this runs the vmapped
        MC-dropout pass and gates on the per-observation calibrated
        thresholds AND predictive uncertainty (the reference's
        ``get_confident_observations`` role,
        ``modeling_expert_model_uncertainty.py:110-140``); otherwise a
        single deterministic forward with a scalar threshold.
        """
        ids, mask = self.tokenizer.encode(clinical_context,
                                          self.config.text.max_length)
        pv = jnp.asarray(image)[None]
        tid = jnp.asarray(ids)[None]
        tmask = jnp.asarray(mask)[None]
        uncertainty = None
        member_stack = None    # [M, 1, n_obs] for the targeting stacker
        # ensemble serving: the mean calibrated probability replaces
        # the single-model MC-dropout gate (members are deterministic
        # forwards; the ensemble disagreement plays the uncertainty
        # role)
        if (not self._members
                and "thresholds" in self.expert_params
                and hasattr(self.expert_model, "head")):
            from ..models.uncertainty import mc_dropout_predict
            out = mc_dropout_predict(
                self.expert_model, self.expert_params, pv, tid, tmask,
                rng if rng is not None else jax.random.key(0))
            probs = np.asarray(out["mean_probs"])[0]
            uncertainty = np.asarray(out["std_probs"])[0]
            th = np.asarray(self.expert_params["thresholds"])
            confident_mask = (probs > th) & (uncertainty < max_uncertainty)
            if self.stacker is not None:
                # fit/serve feature parity (advisor round-3): the
                # stacker is fitted on the deterministic calibrated
                # forward (_expert_prob_stack), not MC-dropout means —
                # featurize with the same forward here.
                member_stack = self._expert_prob_stack(pv, tid, tmask)[1]
        elif self._members:
            # ensemble serving: member DISAGREEMENT is the predictive
            # uncertainty (the MC-dropout std's role) — an observation
            # is confident only when the mean clears the threshold AND
            # the members agree.  One fused dispatch for all members.
            stack = np.asarray(self._ensemble_fwd(
                self._member_params(), pv, tid, tmask))  # [M, 1, n_obs]
            member_stack = stack
            probs = stack.mean(0)[0]
            uncertainty = stack.std(0)[0]
            th = (threshold if threshold is not None
                  else self._thresholds())
            confident_mask = (probs > th) & (uncertainty < max_uncertainty)
        else:
            probs = self._expert_probs(pv, tid, tmask)[0]
            confident_mask = probs > (threshold
                                      if threshold is not None
                                      else self._thresholds())
        confident = {OBSERVATION_NAMES[i]: float(probs[i])
                     for i in range(len(OBSERVATION_NAMES))
                     if confident_mask[i]}
        if member_stack is None:
            member_stack = np.asarray(probs)[None, None]
        return {"probs": probs, "uncertainty": uncertainty,
                "confident_observations": confident,
                "member_stack": member_stack}

    # ------------------------------------------------------------------
    def _make_generation_fn(self, image_embedding,
                            temperature: float = 0.0, seed: int = 0,
                            banned_mask=None):
        """Decoder closure; ``temperature > 0`` gives stochastic
        sampling (seeded, advanced per call) for self-consistency
        verification — greedy otherwise.  ``banned_mask`` ([vocab]
        bool) enables constrained decoding (contribution 3.3)."""
        max_prompt, max_new = self._prompt_budget()
        counter = [0]
        banned = None if banned_mask is None else jnp.asarray(banned_mask)

        def generation_fn(context: str) -> str:
            # left-truncate: keep the instruction-critical prompt tail
            # (validated line + Findings: marker), as in LM training
            ids, mask = self.tokenizer.encode(context, max_prompt,
                                              truncate="left")
            rng = jax.random.fold_in(jax.random.key(seed), counter[0])
            counter[0] += 1
            tokens = generate(
                self.decoder, self.decoder_params,
                jnp.asarray(ids)[None], jnp.asarray(mask)[None],
                prefix_embedding=image_embedding, rng=rng,
                max_new_tokens=max_new,
                temperature=temperature, banned_mask=banned,
                ring=self.ring)
            return self.tokenizer.decode(np.asarray(tokens)[0])

        return generation_fn

    def filter_conflicting_passages(self, preliminary: str,
                                    passages: list[str]) -> tuple:
        """Knowledge-fusion stage: drop retrieved passages whose mean
        conflict score against the preliminary findings exceeds the
        configured threshold (the reference's ConflictDetector role,
        actually wired into the serving path)."""
        if self._fusion_fwd is None or not passages or not preliminary:
            return passages, []
        seq = self.config.fusion.max_findings_len
        # embed the PF once, broadcast to the passage count
        pf_one, pf_mask_one = self.dpr.embedder.embed_text_hidden(
            [preliminary], seq)
        pf_feats = np.repeat(pf_one, len(passages), axis=0)
        pf_mask = np.repeat(pf_mask_one, len(passages), axis=0)
        sf_feats, sf_mask = self.dpr.embedder.embed_text_hidden(
            passages, seq)
        out = self._fusion_fwd(self.fusion_params,
                               jnp.asarray(pf_feats),
                               jnp.asarray(sf_feats),
                               jnp.asarray(pf_mask),
                               jnp.asarray(sf_mask))
        pos = np.asarray(pf_mask) * np.asarray(sf_mask)
        scores = (np.asarray(out["conflict_scores"]) * pos).sum(axis=1) \
            / np.maximum(pos.sum(axis=1), 1.0)
        keep, dropped = [], []
        threshold = self.config.fusion.conflict_threshold
        for p, s in zip(passages, scores):
            (dropped if s > threshold else keep).append(
                {"passage": p, "conflict_score": float(s)})
        return [k["passage"] for k in keep], dropped

    def _active_bucket(self, m: int, full: int) -> int:
        """Smallest of {full//4, full//2, full} (rounded up to the
        serving-mesh multiple) that covers ``m`` rows.  A short fixed
        ladder keeps the compile count bounded (static shapes) while
        letting late-RAG-loop programs scale with the ACTIVE study
        count instead of the whole batch — at the quality preset the
        loop ran every batched program at full width to serve the ~2%
        of studies still iterating (9.7 of 10.9 s/batch)."""
        for b in (max(1, full // 4), max(1, full // 2)):
            b = -(-b // self._mesh_size) * self._mesh_size
            if m <= b:
                return b
        return full

    def filter_conflicting_passages_batch(
            self, preliminaries: list[str],
            passages_list: list[list[str]]) -> list[tuple]:
        """Batched conflict filter across all studies: ONE PF embed,
        ONE flattened-and-padded passage embed, ONE fusion forward —
        the per-study ``filter_conflicting_passages`` costs 3 device
        dispatches per study per RAG iteration (each a full relay
        round-trip); at serving batch sizes the fixed dispatch cost
        dominates the fusion compute.  Rows pad to a SHORT bucket
        ladder over the active count (``_active_bucket``) so the
        programs keep a handful of static shapes while inactive
        studies stop paying for embeds they don't need.
        Returns per-study (kept_passages, dropped) with the per-study
        method's exact semantics (no filtering without a preliminary)."""
        n = len(passages_list)
        out_unfiltered = [(list(p), []) for p in passages_list]
        if self._fusion_fwd is None:
            return out_unfiltered
        rows = [(i, p) for i in range(n) if preliminaries[i]
                for p in passages_list[i]]
        if not rows:
            return out_unfiltered
        seq = self.config.fusion.max_findings_len
        cap = max(self.config.rag.top_k,
                  max(len(p) for p in passages_list))
        # PF embed: only studies WITH a preliminary, padded to the
        # active bucket (was: all n rows)
        act = [i for i in range(n) if preliminaries[i]]
        pb = self._active_bucket(len(act), n)
        act_pad = act + [act[-1]] * (pb - len(act))
        pf_all, pf_mask_all = self.dpr.embedder.embed_text_hidden(
            [preliminaries[i] for i in act_pad], seq)    # [pb, S, H]
        pos_of = {i: j for j, i in enumerate(act)}
        # SF embed: flattened passages padded to the active bucket of
        # the full n*cap width (was: always n*cap)
        total = self._active_bucket(len(rows), n * cap)
        texts = [p for (_, p) in rows] + [""] * (total - len(rows))
        sf_feats, sf_mask = self.dpr.embedder.embed_text_hidden(
            texts, seq)
        row_of = np.asarray([pos_of[i] for (i, _) in rows]
                            + [0] * (total - len(rows)))
        out = self._fusion_fwd(self.fusion_params,
                               jnp.asarray(pf_all[row_of]),
                               jnp.asarray(sf_feats),
                               jnp.asarray(pf_mask_all[row_of]),
                               jnp.asarray(sf_mask))
        pos = pf_mask_all[row_of] * sf_mask
        scores = ((np.asarray(out["conflict_scores"]) * pos).sum(axis=1)
                  / np.maximum(pos.sum(axis=1), 1.0))
        threshold = self.config.fusion.conflict_threshold
        keeps = [[] for _ in range(n)]
        drops = [[] for _ in range(n)]
        for r, (i, p) in enumerate(rows):
            if scores[r] > threshold:
                drops[i].append({"passage": p,
                                 "conflict_score": float(scores[r])})
            else:
                keeps[i].append(p)
        return [(keeps[i], drops[i]) if preliminaries[i]
                else out_unfiltered[i] for i in range(n)]

    def _make_retrieval_fn(self, image_embedding=None,
                           query_observations=None,
                           preliminary_ref=None,
                           conflict_log=None):
        """Retrieval closure returning (passage, score) pairs — the
        reference's retrieval contract (``modeling_iterative_rag.py:
        237-246``) — with fusion conflict filtering applied first."""
        def retrieval_fn(query: str, k: int) -> list[tuple[str, float]]:
            if self.dpr is None or self.dpr.index.count == 0:
                return []
            results = self.dpr.retrieve_for_text(
                query, k, query_observations=query_observations)
            passages = [r["passage"] for r in results]
            score_of = {r["passage"]: r["score"] for r in results}
            if self._fusion_fwd is not None and preliminary_ref:
                passages, dropped = self.filter_conflicting_passages(
                    preliminary_ref[0], passages)
                if conflict_log is not None:
                    conflict_log.extend(dropped)
            return [(p, score_of.get(p, 0.0)) for p in passages]
        return retrieval_fn

    # ------------------------------------------------------------------
    def _prompt_budget(self) -> tuple[int, int]:
        """(max_prompt_tokens, max_new_tokens) for decoder calls.

        The prompt budget MIRRORS TRAINING: ``make_lm_examples`` gives
        the context ``max_length // 2`` tokens and the report the rest.
        The old serving computation (``max_len - max_new_tokens - 1``)
        truncated tiny-preset prompts to 27 tokens — chopping off the
        trailing "Validated observations: …\\nFindings:" line the
        decoder is trained to follow, which silently severed the expert
        stage from generation (round-2 leak-free failure: pipeline
        obs-F1 0.21 while the expert gate ran at 0.6)."""
        max_len = self.config.decoder.max_length
        max_prompt = max_len // 2
        max_new = min(self.config.rag.max_new_tokens,
                      max_len - max_prompt)
        return max_prompt, max_new

    def _batch_generate(self, contexts: list[str], image_embeddings,
                        banned_mask=None):
        """One batched decoder call over ragged prompt strings.
        ``banned_mask`` ([B, vocab] bool) applies per-row constrained
        decoding (contribution 3.3)."""
        max_prompt, max_new = self._prompt_budget()
        ids, mask = self.tokenizer.encode_batch(contexts, max_prompt,
                                                truncate="left")
        tokens = generate(
            self.decoder, self.decoder_params, self._put_batch(ids),
            self._put_batch(mask), prefix_embedding=image_embeddings,
            max_new_tokens=max_new,
            temperature=0.0,
            banned_mask=(None if banned_mask is None
                         else self._put_batch(banned_mask)),
            ring=self.ring)
        tokens = np.asarray(tokens)
        return [self.tokenizer.decode(tokens[i])
                for i in range(tokens.shape[0])]

    def generate_reports_batch(self, images: list[np.ndarray],
                               clinical_contexts: list[str],
                               reference_texts: list[str] | None = None,
                               verify_grounding: bool = False,
                               prior_images: list[np.ndarray] | None = None
                               ) -> list[dict]:
        """Batched serving path: the expert forward, image embedding and
        every RAG-iteration decode run as single batched XLA programs
        across all still-active studies; only the string-space loop
        control is per-study.  Converged studies keep decoding inside
        the fixed batch (their outputs are frozen host-side) so shapes
        stay static — the TPU-friendly trade.

        ``prior_images`` (optional, with a temporal model): ONE batched
        progression forward over all (current, prior) pairs; the
        comparison statements are appended to each study's clinical
        context before the expert/decoder stages — batched parity with
        ``generate_report(prior_image=…)`` (contribution 3.1).
        """
        # data-parallel serving: every batched program's leading dim
        # must divide the mesh — pad by repeating the last study and
        # slice the padded rows off the returned results
        n_req = len(images)
        if self._mesh_size > 1 and n_req % self._mesh_size:
            pad = -n_req % self._mesh_size
            images = list(images) + [images[-1]] * pad
            clinical_contexts = (list(clinical_contexts)
                                 + [clinical_contexts[-1]] * pad)
            if reference_texts is not None:
                reference_texts = (list(reference_texts)
                                   + [reference_texts[-1]] * pad)
            if prior_images is not None:
                prior_images = (list(prior_images)
                                + [prior_images[-1]] * pad)

        n = len(images)
        refs = reference_texts or [None] * n
        cfg = self.config.rag

        # per-stage wall-clock for THIS batch, mirrored from the
        # single-study path's breakdown; published as
        # ``self.last_batch_timings`` so throughput benches can
        # attribute seconds/batch (round-5: the quality preset's
        # 11 s/batch needed exactly this witness)
        timings: dict[str, float] = {}
        _last = [time.perf_counter()]

        def _mark(stage: str) -> None:
            now = time.perf_counter()
            timings[stage] = timings.get(stage, 0.0) + (now - _last[0])
            _last[0] = now

        # One upload, normalize on device: uint8 batches (the
        # production wire format — HTTP front door, MIMIC JPGs) go up
        # the relay at 1/4 the bytes of normalized float32 and run the
        # fused resize+scale+normalize program on device
        # (data/dataset.preprocess_images — the north-star "decode/
        # resize/normalize fuses into a jitted preprocessing stage").
        # Measured round-4: the async serving front door is image-
        # upload-bound at b64 (38 MB float32 vs 9.6 MB uint8).
        imgs_dev = self._preprocess_batch(images)
        _mark("preprocess")

        temporal_stmts: list[str | None] = [None] * n
        progression = None
        if prior_images is not None:
            if self._temporal_fwd is None:
                raise ValueError("prior_images given but the pipeline "
                                 "was built without a temporal model")
            if len(prior_images) != n:
                raise ValueError(f"{len(prior_images)} prior images "
                                 f"for {n} studies")
        if prior_images is not None:
            from ..models.temporal import comparison_statements
            logits = np.asarray(self._temporal_fwd(
                self.temporal_params,
                imgs_dev,
                self._preprocess_batch(prior_images)))
            progression = np.argmax(logits, -1)          # [B, 14]
            temporal_stmts = [comparison_statements(progression[i])
                              for i in range(n)]
            clinical_contexts = [
                f"{clinical_contexts[i]} Comparison: {temporal_stmts[i]}"
                for i in range(n)]
            _mark("temporal")

        image_embeddings = None
        if self.dpr is not None:
            # embed straight from the device-resident batch (no second
            # host->device staging); re-commit the output with the
            # batch sharding so the decoder prefix rides the same SPMD
            # program as the ids
            image_embeddings = self._put_batch(
                np.asarray(self.dpr.embedder.embed_images_device(
                    imgs_dev)))
            _mark("image_embed")

        # stage 2 (batched): calibrated expert observations, with the
        # cross-modal image-neighbour veto on positives (round-3)
        # ONE shared image-neighbour search at max(veto, corroborate)
        # k — the veto and corroboration channels slice their own
        # prefix (results are score-sorted, so a top-m slice equals a
        # fresh k=m search); saves a dispatch per batch
        nbr_ids = nbr_scores = None
        kmax = max(cfg.veto_top_m, cfg.corroborate_top_m)
        if self.stacker is not None:
            from .targeting import VOTE_TOP_MS
            kmax = max(kmax, max(VOTE_TOP_MS))
        if (self._expert_fwd is not None
                and image_embeddings is not None and self.dpr is not None
                and self.dpr.index.count > 0 and kmax > 0):
            nbr_scores, nbr_ids = self.dpr.index.search(
                np.asarray(image_embeddings), kmax)
            nbr_scores = np.asarray(nbr_scores)
            nbr_ids = np.asarray(nbr_ids)

        expert_obs = [{} for _ in range(n)]
        probs = None
        q_obs = None
        if self._expert_fwd is not None:
            ids, mask = self.tokenizer.encode_batch(
                clinical_contexts, self.config.text.max_length)
            probs, prob_stack = self._expert_prob_stack(
                imgs_dev, self._put_batch(ids),
                self._put_batch(mask))
            th = np.broadcast_to(
                np.asarray(self._thresholds(), np.float32),
                probs.shape[-1:])
            votes = (self._neighbour_votes(np.asarray(image_embeddings),
                                           neighbour_ids=nbr_ids)
                     if image_embeddings is not None else None)
            decisions = self._gate_positives(probs, probs > th, votes,
                                             prob_stack, nbr_ids,
                                             nbr_scores)
            q_obs = decisions.astype(np.float32)
            for i in range(n):
                expert_obs[i] = {
                    OBSERVATION_NAMES[j]: float(probs[i, j])
                    for j in range(len(OBSERVATION_NAMES))
                    if decisions[i, j]}
            _mark("expert")

        # first-pass constrained decoding (contribution 3.3): entities
        # the expert scores <= hallucination_threshold are banned in
        # EVERY decode for that row, not just the post-hoc repair
        banned0 = None
        if verify_grounding and probs is not None:
            banned0 = self._banned_masks(probs)

        from .prompts import build_prompt
        contexts = [build_prompt(clinical_contexts[i], expert_obs[i])
                    for i in range(n)]

        preliminary = self._batch_generate(contexts, image_embeddings,
                                           banned_mask=banned0)
        _mark("preliminary_decode")
        generations: list[list[str]] = [[p] for p in preliminary]
        cumulative: list[set] = [set() for _ in range(n)]
        seen: list[set] = [set() for _ in range(n)]
        retrieved: list[list[str]] = [[] for _ in range(n)]
        done = [False] * n
        current = list(preliminary)
        last_prompt = list(contexts)

        # loop-expected set: expert-confident + image-neighbour
        # corroborated observations (the corroboration channel is what
        # lets retrieval ADD information the leak-free prompt lacks)
        corroborated = [set() for _ in range(n)]
        if probs is not None and image_embeddings is not None:
            corroborated = self.corroborate_observations(
                np.asarray(image_embeddings), probs,
                neighbour_ids=nbr_ids)
        expected = [self.rag.expected_in_vocab(
            set(expert_obs[i]) | corroborated[i]) for i in range(n)]
        # expert-gated accrual set: a draft mention only joins the
        # cumulative/target set if the expert does NOT confidently
        # refute it (see rag.plan_iteration)
        allowed = [None] * n
        if probs is not None:
            from .grounding import GroundingVerifier
            h_th = GroundingVerifier().hallucination_threshold
            allowed = [{OBSERVATION_NAMES[j]
                        for j in range(len(OBSERVATION_NAMES))
                        if probs[i, j] > h_th} for i in range(n)]

        _mark("loop_setup")
        for iteration in range(cfg.max_iterations - 1):
            # pass 1 (host): plan every active study, collect queries
            active, missings = [], {}
            for i in range(n):
                if done[i]:
                    continue
                done[i], missing, detected = self.rag.plan_iteration(
                    generations[i], cumulative[i], refs[i], expected[i],
                    allowed[i])
                cumulative[i] |= detected
                if not done[i]:
                    active.append(i)
                    missings[i] = missing
            _mark("loop_plan")
            # pass 2 (device): ONE batched embed + index search for all
            # active studies — per-study retrieval calls are host-RTT
            # bound (~90 ms each through the relay).  The batch is
            # PADDED to the full study count so the embed/search
            # programs keep ONE static shape (a varying active-count
            # would trigger a recompile per distinct count).
            hits_of: dict[int, list] = {i: [] for i in active}
            if active and self.dpr is not None and self.dpr.index.count:
                queries = [
                    (self.rag.retriever.build_retrieval_query(
                        missings[i]) if i in missings and not done[i]
                     else "padding")
                    for i in range(n)]
                all_hits = self.dpr.retrieve_for_texts(
                    queries, cfg.top_k, q_obs)
                hits_of = {i: all_hits[i] for i in active}
            _mark("loop_retrieve")
            # pass 3 (host + fusion): rank, filter, build prompts.
            # The conflict filter runs ONCE batched over all active
            # studies (3 dispatches total, not 3 per study)
            filtered = None
            if self._fusion_fwd is not None and active:
                prelims = [""] * n
                plist: list[list[str]] = [[] for _ in range(n)]
                for i in active:
                    prelims[i] = generations[i][-1]
                    plist[i] = [h["passage"]
                                for h in hits_of.get(i, [])]
                filtered = self.filter_conflicting_passages_batch(
                    prelims, plist)
            _mark("loop_fusion")
            for i in active:
                gen = generations[i][-1]
                hits = hits_of.get(i, [])
                passages = [h["passage"] for h in hits]
                score_of = {h["passage"]: h["score"] for h in hits}
                if filtered is not None:
                    passages = filtered[i][0]
                scores = [score_of.get(p, 0.0) for p in passages]
                ranked = self.rag.retriever.rank_retrieved_passages(
                    passages, missings[i], seen[i], scores)
                seen[i].update(ranked)
                retrieved[i].extend(ranked)
                from .prompts import build_regeneration_prompt
                current[i] = build_regeneration_prompt(
                    gen, ranked[: cfg.evidence_passages],
                    expected[i] | missings[i])
                last_prompt[i] = current[i]
            if all(done):
                break
            # one batched decode for everyone (frozen rows ignored)
            # decode only the ACTIVE rows, padded to a short bucket
            # ladder: with strong experts most studies finish in one
            # pass, and a full-width decode to serve the stragglers
            # was the quality preset's dominant serving cost
            m = len(active)
            b = self._active_bucket(m, n)
            if b < n:
                rows_idx = active + [active[-1]] * (b - m)
                sub_emb = None
                if image_embeddings is not None:
                    sub_emb = self._put_batch(np.asarray(
                        image_embeddings)[np.asarray(rows_idx)])
                sub_banned = (None if banned0 is None
                              else banned0[np.asarray(rows_idx)])
                outs_sub = self._batch_generate(
                    [current[i] for i in rows_idx], sub_emb,
                    banned_mask=sub_banned)
                for j, i in enumerate(active):
                    generations[i].append(outs_sub[j])
            else:
                outs = self._batch_generate(current, image_embeddings,
                                            banned_mask=banned0)
                for i in range(n):
                    if not done[i]:
                        generations[i].append(outs[i])
            _mark("loop_decode")

        _mark("loop_residual")
        best_idx = []
        for i in range(n):
            if refs[i]:
                target = self.rag.detector.detect_observations(refs[i])
            else:
                target = expected[i] | cumulative[i]
            best_idx.append(self.rag.select_best_generation(
                generations[i], target))
        final = [generations[i][best_idx[i]] for i in range(n)]

        # contribution 3.3 (batched): entity verification; rows with
        # hallucinations share ONE constrained batched regeneration
        # with per-row banned-token masks
        grounding: list[dict | None] = [None] * n
        if verify_grounding and self._expert_fwd is not None:
            from .grounding import GroundingVerifier
            verifier = GroundingVerifier()
            vocab = self.config.decoder.vocab_size
            masks = (banned0.copy() if banned0 is not None
                     else np.zeros((n, vocab), bool))
            # cross-modal mention grading: the veto rule also vets the
            # final text's mentions (round-3: most leak-free FP
            # mentions enter via drafts/accrual, not the expert set)
            vkw = lambda i: dict(
                neighbour_votes=(votes[i] if votes is not None else None),
                veto_prob=cfg.veto_mention_prob,
                veto_min_votes=cfg.veto_mention_votes,
                veto_floor=cfg.veto_mention_floor)
            flagged = []
            for i in range(n):
                grounding[i] = verifier.verify(final[i], probs[i],
                                               **vkw(i))
                if grounding[i]["hallucinated"]:
                    m = verifier.banned_token_mask(
                        self.tokenizer, grounding[i]["hallucinated"],
                        vocab_size=vocab)
                    if m is not None:
                        masks[i] |= m
                    flagged.append(i)
            if flagged:
                # regenerate from each row's LAST prompt (keeps the
                # retrieval evidence the loop accrued; ADVICE r2), with
                # the hallucinated entities' tokens added to the ban
                regen = self._batch_generate(last_prompt,
                                             image_embeddings,
                                             banned_mask=masks)
                for i in flagged:
                    # scrub with the REGENERATED text's own verdicts,
                    # unioned with the original list (ADVICE r2: a
                    # regeneration can introduce a different
                    # low-probability entity)
                    post = verifier.verify(regen[i], probs[i], **vkw(i))
                    fixed = verifier.filter_hallucinated_sentences(
                        regen[i], sorted(set(
                            grounding[i]["hallucinated"])
                            | set(post["hallucinated"])))
                    grounding[i]["unconstrained_report"] = final[i]
                    grounding[i]["post_constrained"] = verifier.verify(
                        fixed, probs[i], **vkw(i))
                    final[i] = fixed
        if verify_grounding:
            _mark("grounding")

        results = []
        for i in range(n):
            results.append({
                "preliminary_findings": preliminary[i],
                "report": final[i],
                "best_index": best_idx[i],
                "iterations": len(generations[i]),
                "consistency_score":
                    self.rag.verifier.compute_consistency(generations[i]),
                "expert_observations": expert_obs[i],
                "retrieved_passages": retrieved[i],
                **({"grounding": grounding[i]} if grounding[i] else {}),
                **({"comparison": temporal_stmts[i],
                    "progression": progression[i].tolist()}
                   if temporal_stmts[i] is not None else {}),
            })
        #: stage seconds for the batch just served (throughput benches
        #: read this to attribute seconds/batch)
        self.last_batch_timings = {k: round(v, 4)
                                   for k, v in sorted(timings.items())}
        return results[:n_req]

    def generate_report(self, image: np.ndarray, clinical_context: str,
                        reference_text: str | None = None,
                        prior_image: np.ndarray | None = None,
                        verify_grounding: bool = False,
                        oracle_expected: set | None = None) -> dict:
        """End-to-end report generation for one study.

        ``oracle_expected`` (diagnostic only): replace the loop's
        expected-observation set — normally expert-confident ∪
        image-neighbour-corroborated — with the given set (e.g. the
        ground-truth labels).  Every other stage (prompt construction,
        constrained decoding, grounding) still runs off the real expert,
        so the measurement isolates the RAG loop's *targeting* channel:
        loop-with-oracle vs single-pass is the loop's value ceiling at
        perfect targeting (the quantity DESIGN.md's round-3 analysis
        argues bounds the loop's gain by the expert stage's miss set).

        With ``prior_image`` (and a temporal model), the comparison
        statements from the progression classifier are appended to the
        clinical context so the decoder writes a comparison-aware
        report (contribution 3.1 serving hook).

        With ``verify_grounding`` (and an expert model), every
        observation the final report mentions is verified entity-level
        against the expert's image-conditioned probabilities; if any
        are hallucinated, the report is regenerated with their name
        tokens banned inside the decode loop and residual mentions
        scrubbed (contribution 3.3).
        """
        # per-stage host wall-clock: each stage materialises numpy /
        # string outputs, so the timer captures dispatch + execution +
        # transfer (the relay's round-trip cost shows up where it is
        # actually paid)
        timings: dict[str, float] = {}
        _last = [time.perf_counter()]

        def _mark(stage: str) -> None:
            now = time.perf_counter()
            timings[stage] = timings.get(stage, 0.0) + (now - _last[0])
            _last[0] = now

        temporal_out = None
        if prior_image is not None and self._temporal_fwd is not None:
            temporal_out = self.compare_with_prior(image, prior_image)
            clinical_context = (f"{clinical_context} Comparison: "
                                f"{temporal_out['statements']}")
            _mark("temporal")
        # image embedding for retrieval + decoder conditioning
        image_embedding = None
        if self.dpr is not None:
            image_embedding = jnp.asarray(
                self.dpr.embedder.embed_images([image]))
            _mark("image_embed")

        # stage 1+2: calibrated expert observations, cross-modal veto
        # on positives (round-3)
        # shared image-neighbour search for the veto + corroboration
        # channels (one dispatch; slices are exact — see the batched
        # path)
        nbr_ids = nbr_scores = None
        rag_cfg = self.config.rag
        kmax = max(rag_cfg.veto_top_m, rag_cfg.corroborate_top_m)
        if self.stacker is not None:
            from .targeting import VOTE_TOP_MS
            kmax = max(kmax, max(VOTE_TOP_MS))
        if (self._expert_fwd is not None and image_embedding is not None
                and self.dpr is not None and self.dpr.index.count > 0
                and kmax > 0):
            nbr_scores, nbr_ids = self.dpr.index.search(
                np.asarray(image_embedding), kmax)
            nbr_scores = np.asarray(nbr_scores)
            nbr_ids = np.asarray(nbr_ids)

        expert_out = None
        q_obs = None
        if self._expert_fwd is not None:
            expert_out = self.predict_observations(image, clinical_context)
            th = np.broadcast_to(
                np.asarray(self._thresholds(), np.float32),
                expert_out["probs"].shape)
            votes = (self._neighbour_votes(np.asarray(image_embedding),
                                           neighbour_ids=nbr_ids)
                     if image_embedding is not None else None)
            decisions = self._gate_positives(
                expert_out["probs"][None],
                (expert_out["probs"] > th)[None], votes,
                expert_out.get("member_stack"), nbr_ids, nbr_scores)[0]
            q_obs = decisions.astype(np.float32)[None]
            expert_out["confident_observations"] = {
                name: p
                for name, p in expert_out["confident_observations"].items()
                if decisions[OBSERVATION_NAMES.index(name)]}
            _mark("expert")

        # first-pass constrained decoding (contribution 3.3): expert-
        # refuted entities are banned in EVERY decode, not just repair
        banned0 = None
        if verify_grounding and expert_out is not None:
            masks = self._banned_masks(expert_out["probs"][None])
            banned0 = masks[0] if masks is not None else None

        # stage 1: preliminary findings from the decoder; the expert's
        # validated observations are injected into the prompt (the
        # "expert filters knowledge" step of RADAR, README.md:7-10)
        from .prompts import build_prompt
        generation_fn = self._make_generation_fn(image_embedding,
                                                 banned_mask=banned0)
        pf_context = build_prompt(
            clinical_context,
            (expert_out or {}).get("confident_observations"))
        preliminary = generation_fn(pf_context)
        _mark("preliminary_decode")

        # stage 3+4: iterative RAG with targeted retrieval and
        # fusion-stage conflict filtering of supplementary findings.
        # The loop is seeded with the preliminary (counted as iteration
        # 1, mirroring the batched path); the expected set driving
        # blind-mode targeting is the expert's confident observations
        # plus image-neighbour corroborated candidates.
        preliminary_ref = [preliminary]
        conflict_log: list = []
        retrieval_fn = self._make_retrieval_fn(
            image_embedding, q_obs, preliminary_ref, conflict_log)
        expected = set((expert_out or {}).get(
            "confident_observations", {}))
        corroborated: set = set()
        if expert_out is not None and image_embedding is not None:
            corroborated = self.corroborate_observations(
                np.asarray(image_embedding),
                expert_out["probs"][None], neighbour_ids=nbr_ids)[0]
            _mark("corroborate")
        allowed = None
        if expert_out is not None:
            from .grounding import GroundingVerifier
            h_th = GroundingVerifier().hallucination_threshold
            p = expert_out["probs"]
            allowed = {OBSERVATION_NAMES[j]
                       for j in range(len(OBSERVATION_NAMES))
                       if p[j] > h_th}
        loop_expected = (set(oracle_expected)
                         if oracle_expected is not None
                         else expected | corroborated)
        rag_out = self.rag.generate_with_iterative_retrieval(
            pf_context, retrieval_fn, generation_fn,
            reference_text=reference_text,
            expected_observations=loop_expected,
            initial_generation=preliminary,
            allowed_observations=allowed)
        _mark("rag_loop")

        grounding = None
        final_text = rag_out["final_text"]
        if verify_grounding and expert_out is not None:
            from .grounding import GroundingVerifier
            verifier = GroundingVerifier()
            vkw = dict(
                neighbour_votes=(votes[0] if votes is not None else None),
                veto_prob=self.config.rag.veto_mention_prob,
                veto_min_votes=self.config.rag.veto_mention_votes,
                veto_floor=self.config.rag.veto_mention_floor)
            grounding = verifier.verify(final_text, expert_out["probs"],
                                        **vkw)
            if grounding["hallucinated"]:
                banned = verifier.banned_token_mask(
                    self.tokenizer, grounding["hallucinated"],
                    vocab_size=self.config.decoder.vocab_size)
                if banned is not None and banned0 is not None:
                    banned = banned | np.asarray(banned0)
                elif banned is None:
                    banned = banned0
                constrained = self._make_generation_fn(
                    image_embedding, banned_mask=banned)
                # regenerate from the loop's LAST prompt (keeps accrued
                # evidence) and scrub with the regenerated text's own
                # verdicts unioned in (ADVICE r2)
                regen_raw = constrained(rag_out["last_context"])
                post = verifier.verify(regen_raw, expert_out["probs"],
                                       **vkw)
                regen = verifier.filter_hallucinated_sentences(
                    regen_raw, sorted(set(grounding["hallucinated"])
                                      | set(post["hallucinated"])))
                grounding["unconstrained_report"] = final_text
                grounding["post_constrained"] = verifier.verify(
                    regen, expert_out["probs"], **vkw)
                final_text = regen
        if grounding is not None:
            _mark("grounding")

        result = {
            "preliminary_findings": preliminary,
            "report": final_text,
            "iterations": rag_out["num_iterations"],
            "consistency_score": rag_out["consistency_score"],
            "expert_observations": (expert_out or {}).get(
                "confident_observations", {}),
            "retrieved_passages": rag_out["retrieved_passages"],
            "corroborated_observations": sorted(corroborated),
            "conflicting_passages": conflict_log,
            "rag": rag_out,
            "timings": timings,
        }
        if temporal_out is not None:
            result["comparison"] = temporal_out["statements"]
            result["progression"] = temporal_out["progression"].tolist()
        if grounding is not None:
            result["grounding"] = grounding
        return result

    def generate_report_with_verification(
            self, image: np.ndarray, clinical_context: str,
            num_samples: int | None = None,
            temperature: float = 0.7, seed: int = 0) -> dict:
        """N-sample self-consistency serving (reference
        ``generate_with_verification`` :277-315) with *stochastic*
        decoding — each sample runs the full iterative loop at
        ``temperature`` with a distinct seed, so the consistency score
        measures real agreement (greedy sampling would make all N
        samples identical and the score trivially 1.0)."""
        expert_out = None
        if self._expert_fwd is not None:
            expert_out = self.predict_observations(image, clinical_context)
        expected = set((expert_out or {}).get(
            "confident_observations", {}))

        image_embedding = None
        q_obs = None
        if expert_out is not None:
            th = np.broadcast_to(
                np.asarray(self._thresholds(), np.float32),
                expert_out["probs"].shape)
            q_obs = (expert_out["probs"] > th).astype(np.float32)[None]
        if self.dpr is not None:
            image_embedding = jnp.asarray(
                self.dpr.embedder.embed_images([image]))

        from .prompts import build_prompt
        pf_context = build_prompt(
            clinical_context,
            (expert_out or {}).get("confident_observations"))
        retrieval_fn = self._make_retrieval_fn(image_embedding, q_obs)

        def fn_factory(i: int):
            # sample 0 is GREEDY: it anchors the candidate pool so the
            # selection step can never fall below the deterministic
            # serving path (round-2 weak spot: temp-0.7 3-sample scored
            # BLEU-4 0.310 vs 0.347 greedy — stochastic-only pools trade
            # away quality for the consistency measurement); samples
            # 1..N-1 stay stochastic so consistency still measures
            # real agreement.
            return self._make_generation_fn(
                image_embedding,
                temperature=0.0 if i == 0 else temperature,
                seed=seed * 1000 + i)

        out = self.rag.generate_with_verification(
            pf_context, retrieval_fn, fn_factory(0),
            num_samples=num_samples,
            expected_observations=expected,
            generation_fn_factory=fn_factory)
        out["expert_observations"] = (expert_out or {}).get(
            "confident_observations", {})
        return out
