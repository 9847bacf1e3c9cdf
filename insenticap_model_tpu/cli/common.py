"""Shared CLI plumbing: artifact IO, reference-compatible tokenization,
loader construction, mesh runtime, and result dumping.

Artifact schemas are byte-compatible with the reference's JSON contracts
(SURVEY.md §1): idx2word.json (list), img_captions.json
({split: {fn: [[word, ...], ...]}}), img_det_concepts.json ({fn: [word]}),
img_det_sentiments.json ({fn: [word]}), senti_captions.json
({senti: [[cap_words, cpt_words, senti_words], ...]}),
img_senti_labels.json ({split: [[fn, senti_name], ...]}).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Opts
from ..data import collate
from ..data.feature_store import open_store  # noqa: F401 (re-export:
#   the train/eval CLIs open stores as common.open_store)
from ..data.loaders import Loader
from ..models.captioner import TokenIds
from ..parallel import mesh as pmesh
from ..vocab import Vocab, upsample_to_neutral

HOST_KEYS = ("fns", "ground_truth", "valid")


def load_json(*parts):
    with open(os.path.join(*parts)) as f:
        return json.load(f)


def corpus_path(opt: Opts, *names):
    return os.path.join(opt.captions_dir, opt.dataset_name, opt.corpus_type,
                        *names)


def dataset_path(opt: Opts, *names):
    return os.path.join(opt.captions_dir, opt.dataset_name, *names)


def load_vocab(opt: Opts) -> Vocab:
    return Vocab(load_json(corpus_path(opt, "idx2word.json")))


def token_ids(vocab: Vocab, sentiment_categories) -> TokenIds:
    return TokenIds(pad=vocab.pad_id, unk=vocab.unk_id, sos=vocab.sos_id,
                    eos=vocab.eos_id,
                    neutral=list(sentiment_categories).index("neutral"))


def load_concept_model(path: str):
    """Concept checkpoint -> (params, idx2concept); the inference-side
    bootstrap shared by caption.py and serve.py."""
    from ..config import Settings
    from ..models import concept_detector as cpt_det
    from ..training import checkpoint as ckpt
    cmeta = ckpt.load_metadata(path)
    idx2concept = cmeta["idx2concept"]
    params, _, _ = ckpt.load(path, cpt_det.init_params(
        jax.random.PRNGKey(2), len(idx2concept),
        Settings.from_dict(cmeta["settings"])))
    return params, idx2concept


def senti_word_ids(concepts, senti_table, vocab: Vocab,
                   num_sentiments: int) -> np.ndarray:
    """Detected concepts -> ranked sentiment-word id row
    [num_sentiments] int32, PAD-padded — the per-image det_sentiments
    pipeline (reference preprocess.py:280-302) as used at inference time
    by caption.py and the serving daemon."""
    from ..preprocessing import _rank_sentis
    words = _rank_sentis(concepts, senti_table)[:num_sentiments]
    row = np.full((num_sentiments,), vocab.pad_id, np.int32)
    ids = vocab.encode_filter(words)
    row[:len(ids)] = ids
    return row


def sniff_store_path(path: str) -> str:
    """Prefer a native-format (.isc) store at the same stem when present;
    otherwise return the given path (typically .h5)."""
    stem, _ = os.path.splitext(path)
    return stem + ".isc" if os.path.exists(stem + ".isc") else path


def feature_paths(opt: Opts):
    """<feats_dir>/<ds>/<ds>_fc.h5 layout (reference train_xe.py:122-123);
    open_store also accepts the native record format at the same path with
    any extension."""
    base = os.path.join(opt.feats_dir, opt.dataset_name)
    fc = os.path.join(base, f"{opt.dataset_name}_fc.h5")
    att = os.path.join(base, f"{opt.dataset_name}_att.h5")
    for ext in (".isc", ".h5"):
        if os.path.exists(fc[:-3] + ext):
            fc = fc[:-3] + ext
        if os.path.exists(att[:-3] + ext):
            att = att[:-3] + ext
    return fc, att


def tokenize_captions(img_captions: Dict, vocab: Vocab) -> Dict:
    """{split: {fn: [[w..]..]}} -> ids with SOS/EOS (train_xe.py:81-94)."""
    return {split: {fn: [vocab.encode_caption(seq) for seq in seqs]
                    for fn, seqs in caps.items()}
            for split, caps in img_captions.items()}


def tokenize_concepts(img_det_concepts: Dict, vocab: Vocab) -> Dict:
    """Strict lookup (train_xe.py:97-100)."""
    return {fn: vocab.encode_strict(ws)
            for fn, ws in img_det_concepts.items()}


def tokenize_sentiments(img_det_sentiments: Dict, vocab: Vocab) -> Dict:
    """Filtered lookup (train_rl.py:126-131 uses plain indexing on words
    already restricted to the vocab; filter keeps OOV-safe)."""
    return {fn: vocab.encode_filter(ws)
            for fn, ws in img_det_sentiments.items()}


def tokenize_senti_corpus(senti_captions: Dict, vocab: Vocab,
                          sentiment_categories,
                          upsample: bool = True) -> List:
    """-> [[cap_ids, cpt_ids, senti_ids, senti_label], ...] with the
    integer-ratio pos/neg upsampling (train_xe.py:102-120)."""
    if upsample:
        senti_captions = upsample_to_neutral(senti_captions)
    label2idx = {w: i for i, w in enumerate(sentiment_categories)}
    out = []
    for senti, caps in senti_captions.items():
        sid = label2idx[senti]
        for cap, cpts, sentis in caps:
            out.append([vocab.encode_caption(cap),
                        vocab.encode_filter(cpts),
                        vocab.encode_strict(sentis), sid])
    return out


def flatten_caption_items(captions_id: Dict, concepts_id: Dict) -> List:
    """One row per caption, images repeated (dataloader.py:164-181)."""
    return [(fn, cap, concepts_id[fn])
            for fn, caps in captions_id.items() for cap in caps]


class Runtime:
    """Mesh + placement + dtype policy for a CLI run."""

    def __init__(self, opt: Opts):
        global _ACTIVE_MESH
        self.opt = opt
        self.mesh = pmesh.make_mesh(opt.mesh_shape or None)
        _ACTIVE_MESH = self.mesh  # host_shard()'s default mesh context
        self.model_sharded = False  # set by place_captioner
        self.dtype = jnp.bfloat16 if opt.compute_dtype == "bfloat16" \
            else jnp.float32
        n = self.mesh.devices.size
        print(f"====> mesh: {tuple(self.mesh.shape.values())} "
              f"({n} device(s)), compute dtype {opt.compute_dtype}")
        if int(self.mesh.shape.get("model", 1)) > 1:
            print("====> NOTE: the model axis only shards the captioner "
                  "(train_xe/train_rl via place_captioner); trainers "
                  "without a captioner duplicate work across it — use a "
                  "1-D mesh for those")

    @property
    def num_devices(self) -> int:
        return int(self.mesh.devices.size)

    def round_bs(self, bs: int) -> int:
        """Round batch size up to a multiple of the data-axis width
        (batches shard over `data` only; on a 2-D data x model mesh the
        model axis does not constrain the batch)."""
        n = int(self.mesh.shape.get("data", self.num_devices))
        return -(-bs // n) * n

    def place_captioner(self, params):
        """Place captioner params on the mesh: on a 2-D data x model mesh
        the vocab-dim tensors (embedding + classifier) shard over `model`
        (parallel/mesh.captioner_shardings); otherwise replicate. Falls
        back to replication (with a warning) when the vocab does not
        divide the model axis."""
        ms = int(self.mesh.shape.get("model", 1))
        self.model_sharded = False
        if ms > 1:
            vocab = params["word_embed"]["table"].shape[0]
            if vocab % ms == 0:
                self.model_sharded = True
                return pmesh.place(params,
                                   pmesh.captioner_shardings(self.mesh,
                                                             params))
            print(f"====> WARNING: vocab {vocab} does not divide model "
                  f"axis {ms}; captioner params replicated instead")
        return pmesh.replicate(self.mesh, params)

    def disable_pallas_for_sharded_decode(self):
        """Call from a trainer AFTER place_captioner and BEFORE tracing
        any decode step: the per-epoch decode dumps jit pallas custom
        calls (beam-shared attention, Winograd convs) which GSPMD cannot
        partition over sharded operands — and that holds for DATA-sharded
        batches on a multi-chip mesh just as for model-sharded params
        (ADVICE r2 #2), so any mesh with >1 device disables them. Mutates
        the ISC_* gates process-wide — deliberate for a CLI trainer
        process; library users doing mixed serving in-process should use
        inference.make_sharded_serving_fn (shard_map keeps the kernels
        per-device) and not call this."""
        if jax.default_backend() == "tpu" and self.mesh.devices.size > 1:
            os.environ["ISC_FUSED_ATT"] = "0"
            os.environ["ISC_WINOGRAD"] = "0"
            why = ("model-sharded captioner" if self.model_sharded
                   else f"{self.mesh.devices.size}-device mesh")
            print(f"====> {why}: pallas decode kernels disabled for this "
                  "trainer process (GSPMD cannot partition Mosaic custom "
                  "calls over sharded operands)")

    def place_opt_state(self, opt_state, placed_params, tx):
        """Place a (possibly checkpoint-loaded, host-side) optimizer
        state to match the placed params: leaf shardings are taken from
        a fresh tx.init on the placed params (zeros_like inherits the
        param shardings; jax.eval_shape does NOT propagate shardings, so
        the template is materialized — a transient 2x-params allocation,
        ~80 MB at production scale, startup-only)."""
        template = tx.init(placed_params)
        rep = pmesh.replicated(self.mesh)

        def put(v, t):
            s = t.sharding
            # scalars (optax count) come back uncommitted single-device;
            # replicate them over the mesh. device_put takes host numpy
            # directly — no jnp.asarray staging hop (that would cost an
            # extra full transfer of the Adam moments on resume).
            if not isinstance(s, jax.sharding.NamedSharding):
                s = rep
            return jax.device_put(v, s)

        return jax.tree_util.tree_map(put, opt_state, template)

    def put(self, batch: Dict) -> Dict:
        """Shard array values over the data axis; cast float feats; keep
        host-only keys out."""
        arrs = {}
        for k, v in batch.items():
            if k in HOST_KEYS:
                continue
            v = np.asarray(v)
            if v.dtype in (np.float32, np.float64):
                v = v.astype(self.dtype)
            arrs[k] = v
        return pmesh.shard_batch(self.mesh, arrs)

    def replicate(self, tree):
        return pmesh.replicate(self.mesh, tree)

    def cast(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.dtype)
            if hasattr(x, "dtype") and x.dtype in (jnp.float32, np.float32)
            else x, tree)


# ---------------------------------------------------------------------------
# Loader builders (the reference's get_*_dataloader factories,
# dataloader.py:275-370)
# ---------------------------------------------------------------------------

def host_shard(mesh=None):
    """Item stripe for multi-host data parallelism (None on a single
    host). Passed to every training Loader.

    With a 1-D mesh (or no mesh context) this is the per-process stripe
    (process_index, process_count). On a multi-axis mesh whose model/
    other axes CROSS processes, striping by raw process index is wrong:
    ``jax.make_array_from_process_local_data`` requires every process
    holding a copy of a batch shard to supply the SAME rows, and a batch
    is sharded over `data` only — so processes that share a data-axis
    coordinate must load identical stripes. The stripe is therefore
    derived from the mesh: processes with the same set of data-axis
    coordinates get the same (group_rank, num_groups) stripe (their
    loaders are seeded identically, so the stripes are bit-identical).

    ``mesh`` defaults to the most recently constructed Runtime's mesh
    (the CLI trainers' path — exactly one Runtime per process). A
    process juggling several Runtimes with different meshes must pass
    ``mesh`` explicitly; the module-level default is last-writer-wins
    and only consulted when jax.process_count() > 1."""
    import jax
    n = jax.process_count()
    if n <= 1:
        return None
    if mesh is None:
        mesh = _ACTIVE_MESH
    if mesh is None or mesh.devices.ndim <= 1:
        return (jax.process_index(), n)
    axes = list(mesh.axis_names)
    d_ax = axes.index("data") if "data" in axes else 0
    # data-axis coordinate set per owning process, in mesh device order
    by_proc: dict = {}
    for idx in np.ndindex(mesh.devices.shape):
        by_proc.setdefault(mesh.devices[idx].process_index,
                           set()).add(idx[d_ax])
    me = jax.process_index()
    if me not in by_proc:
        raise ValueError(f"process {me} owns no device of mesh "
                         f"{dict(mesh.shape)}; it must not run loaders")
    groups = {frozenset(v) for v in by_proc.values()}
    mine = frozenset(by_proc[me])
    for a in groups:
        for b in groups:
            if a != b and a & b:
                raise ValueError(
                    "unsupported mesh/process topology: processes "
                    f"{sorted(by_proc)} have overlapping but unequal "
                    "data-coordinate sets — a process cannot stripe for "
                    "a partial data shard")
    ordered = sorted(groups, key=min)
    # stripe r of the dataset lands on data-axis block r (the loaders'
    # global-batch convention), so each group must own one contiguous
    # equal-size block in rank order — a permuted or unequal layout
    # would silently map stripes onto the WRONG global rows
    sizes = {len(g) for g in ordered}
    flat = [c for g in ordered for c in sorted(g)]
    if len(sizes) != 1 or flat != list(range(len(flat))):
        raise ValueError(
            "unsupported mesh/process topology: data-coordinate groups "
            f"{[sorted(g) for g in ordered]} are not equal contiguous "
            "blocks of the data axis — host striping cannot express "
            "this device->process layout; reorder the mesh devices so "
            "each process group owns one contiguous data block")
    return (ordered.index(mine), len(ordered))


_ACTIVE_MESH = None  # set by Runtime.__init__; host_shard's default


def caption_loader(fc_store, att_store, captions_id, concepts_id, vocab,
                   opt: Opts, bs: int, shuffle=True, drop_last=True,
                   seed=0) -> Loader:
    items = flatten_caption_items(captions_id, concepts_id)
    fn = functools.partial(collate.caption_batch,
                           max_seq_len=opt.max_seq_len,
                           num_concepts=opt.num_concepts, pad_id=vocab.pad_id,
                           fc_store=fc_store, att_store=att_store)
    return Loader(items, bs, fn, shuffle=shuffle, drop_last=drop_last,
                  seed=seed, shard=host_shard() if shuffle else None)


def scs_loader(senti_corpus_id, vocab, opt: Opts, bs: int, seed=0) -> Loader:
    fn = functools.partial(collate.scs_batch, max_seq_len=opt.max_seq_len,
                           num_concepts=opt.num_concepts,
                           num_sentiments=opt.num_sentiments,
                           pad_id=vocab.pad_id)
    return Loader(senti_corpus_id, bs, fn, shuffle=True, seed=seed,
                  shard=host_shard())


def rl_fact_loader(fc_store, att_store, captions_id, concepts_id,
                   sentiments_id, vocab, opt: Opts, bs: int, fn2row=None,
                   shuffle=True, drop_last=True, seed=0) -> Loader:
    items = [(fn, caps, concepts_id[fn], sentiments_id[fn])
             for fn, caps in captions_id.items()]
    rng = np.random.default_rng(seed)
    fn = functools.partial(collate.rl_fact_batch, max_seq_len=opt.max_seq_len,
                           num_concepts=opt.num_concepts,
                           num_sentiments=opt.num_sentiments,
                           pad_id=vocab.pad_id, fc_store=fc_store,
                           att_store=att_store, rng=rng, fn2row=fn2row)
    return Loader(items, bs, fn, shuffle=shuffle, drop_last=drop_last,
                  seed=seed, shard=host_shard() if shuffle else None)


def rl_senti_loader(fc_store, att_store, senti_imgs, concepts_id,
                    sentiments_id, label2idx, vocab, opt: Opts, bs: int,
                    shuffle=True, drop_last=True, seed=0) -> Loader:
    """senti_imgs: [[fn, senti_name], ...] (img_senti_labels.json split)."""
    items = [(fn, concepts_id[fn], sentiments_id[fn], label2idx[senti])
             for fn, senti in senti_imgs]
    fn = functools.partial(collate.rl_senti_batch,
                           num_concepts=opt.num_concepts,
                           num_sentiments=opt.num_sentiments,
                           pad_id=vocab.pad_id, fc_store=fc_store,
                           att_store=att_store)
    return Loader(items, bs, fn, shuffle=shuffle, drop_last=drop_last,
                  seed=seed, shard=host_shard() if shuffle else None)


def concept_loader(fc_store, items, num_total_concepts, bs, shuffle=True,
                   drop_last=True, seed=0) -> Loader:
    fn = functools.partial(collate.concept_batch,
                           num_total_concepts=num_total_concepts,
                           fc_store=fc_store)
    return Loader(items, bs, fn, shuffle=shuffle, drop_last=drop_last,
                  seed=seed, shard=host_shard() if shuffle else None)


def senti_image_loader(att_store, items, bs, shuffle=True, drop_last=True,
                       seed=0) -> Loader:
    fn = functools.partial(collate.senti_image_batch, att_store=att_store)
    return Loader(items, bs, fn, shuffle=shuffle, drop_last=drop_last,
                  seed=seed, shard=host_shard() if shuffle else None)


def senti_sents_loader(items, max_seq_len, pad_id, bs, shuffle=True,
                       drop_last=True, seed=0) -> Loader:
    fn = functools.partial(collate.senti_sents_batch, max_seq_len=max_seq_len,
                           pad_id=pad_id)
    return Loader(items, bs, fn, shuffle=shuffle, drop_last=drop_last,
                  seed=seed, shard=host_shard() if shuffle else None)


# ---------------------------------------------------------------------------
# Results / checkpoints
# ---------------------------------------------------------------------------

def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def stage_dirs(opt: Opts, stage: str):
    ck = ensure_dir(os.path.join(opt.checkpoint, stage, opt.dataset_name,
                                 opt.corpus_type))
    rs = ensure_dir(os.path.join(opt.result_dir, stage, opt.dataset_name,
                                 opt.corpus_type))
    return ck, rs


def best_checkpoint(opt: Opts, stage: str) -> str:
    """model-best selection is manual in the reference (hardcoded paths,
    train_xe.py:60). Same convention, .ckpt extension; falls back to the
    newest epoch checkpoint when no model-best exists."""
    d = os.path.join(opt.checkpoint, stage, opt.dataset_name, opt.corpus_type)
    best = os.path.join(d, "model-best.ckpt")
    if os.path.exists(best):
        return best
    cands = sorted((os.path.getmtime(os.path.join(d, f)),
                    os.path.join(d, f)) for f in os.listdir(d)
                   if f.endswith(".ckpt")) if os.path.isdir(d) else []
    if not cands:
        raise FileNotFoundError(f"no checkpoint under {d}")
    return cands[-1][1]


def dump_results(result_dir: str, tag: str, results: List[Dict],
                 vocab: Optional[Vocab] = None) -> None:
    """result_<tag>.json + .txt; id-form .txt too when ids are present —
    the input contract of eval_cls_rnn (reference train_rl.py:283-309)."""
    with open(os.path.join(result_dir, f"result_{tag}.json"), "w") as f:
        json.dump([{"image_id": r["image_id"], "caption": r["caption"]}
                   for r in results], f)
    with open(os.path.join(result_dir, f"result_{tag}.txt"), "w") as f:
        f.write("".join(r["caption"] + "\n" for r in results))
    if results and "ids" in results[0]:
        with open(os.path.join(result_dir, f"result_{tag}_ids.txt"),
                  "w") as f:
            for r in results:
                f.write(" ".join(map(str, r["ids"])) + "\n")


def metrics_line(log_path: str, record: Dict) -> None:
    """Structured jsonl metrics writer (SURVEY.md §5-observability)."""
    with open(log_path, "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")


def run_with_post_mortem(fn, *args):
    """Run a trainer, dropping into pdb.post_mortem on failure when
    ISC_PDB=1 — the reference's QC harness wraps every entry point's
    train() this way unconditionally (train_xe.py:257-267 etc., SURVEY.md
    §4); here it is opt-in so unattended runs fail fast."""
    if os.environ.get("ISC_PDB") != "1":
        return fn(*args)
    try:
        return fn(*args)
    except BaseException:
        import pdb
        import traceback
        traceback.print_exc()
        print("-" * 60)
        pdb.post_mortem()
        raise
