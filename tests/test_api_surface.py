"""API-surface completeness vs the reference.

Scans every public symbol (module-level ``class``/``def`` not starting
with ``_``) in the reference tree and asserts each one either exists
under the same name somewhere in ``polara_tpu`` or is explicitly listed
in ``SUBSUMED`` with its replacement (the same mapping documented for
users in ``docs/MIGRATION.md``).  A reference symbol that is neither
breaks this test — so the migration guide can never silently rot.
"""
import pathlib
import re

import pytest

REFERENCE = pathlib.Path("/root/reference/polara")
REPO = pathlib.Path(__file__).resolve().parent.parent / "polara_tpu"

# Reference symbols consciously replaced by a differently-shaped
# primitive.  Values name the replacement (checked to exist).
SUBSUMED = {
    # data model internals
    "random_choice": "polara_tpu.data.dataset:RecommenderData",
    "random_sample": "polara_tpu.data.dataset:RecommenderData",
    "group_largest_fraction": "polara_tpu.data.dataset:RecommenderData",
    "property_factory": "polara_tpu.data.dataset:RecommenderData",
    "RandomSampleEvaluationMixin":
        "polara_tpu.data.mixins:SampledEvaluationMixin",
    # metric-engine CSR scaffolding -> one fused jitted pass
    "no_copy_csr_matrix": "polara_tpu.evaluation.metrics:compute_metrics",
    "safe_divide": "polara_tpu.evaluation.metrics:compute_metrics",
    "build_rank_matrix": "polara_tpu.evaluation.metrics:compute_metrics",
    "split_positive": "polara_tpu.evaluation.metrics:compute_metrics",
    "generate_hits_data": "polara_tpu.evaluation.metrics:compute_metrics",
    "assemble_scoring_matrices":
        "polara_tpu.evaluation.metrics:compute_metrics",
    "get_ndcr_discounts": "polara_tpu.evaluation.metrics:compute_metrics",
    "get_ndcr_score": "polara_tpu.evaluation.metrics:compute_metrics",
    "get_relevance_data": "polara_tpu.evaluation.metrics:compute_metrics",
    # model-base plumbing
    "get_default": "polara_tpu.config:get_config",
    "clean_build_decorator": "polara_tpu.models.base:RecommenderModel",
    "with_metaclass": "polara_tpu.models.base:RecommenderModel",
    "MetaModel": "polara_tpu.models.base:RecommenderModel",
    "RandomSampleEvaluationSVDMixin":
        "polara_tpu.models.sampled:SampledEvaluationSVDMixin",
    "ItemColdStartRecommenderMixin":
        "polara_tpu.models.coldstart:ColdItemsScoringMixin",
    "read_npz_form_url": "polara_tpu.runtime.memory:read_npz_from_url",
    # numba kernel tier -> device/segment operators (PARITY.md)
    "double_tensordot": "polara_tpu.ops.hooi:hooi",
    "tensordot2": "polara_tpu.ops.hooi:hooi",
    "dttm_seq": "polara_tpu.ops.hooi:hooi",
    "dttm_par": "polara_tpu.ops.hooi:hooi",
    "arrange_index": "polara_tpu.ops.hooi:hooi",
    "arrange_indices": "polara_tpu.ops.hooi:hooi",
    "ttm3d_seq": "polara_tpu.ops.hooi:hooi",
    "ttm3d_par": "polara_tpu.ops.hooi:hooi",
    "tensor_outer_at": "polara_tpu.models.coffee:CoffeeModel",
    "get_nnz_max": "polara_tpu.runtime.memory:plan_user_chunks",
    "check_sparsity": "polara_tpu.runtime.memory:plan_user_chunks",
    "sparse_dot": "polara_tpu.ops.sparse:CooMatrix",
    "matvec2dense": "polara_tpu.ops.sparse:dense_from_coo",
    "matvec2sparse": "polara_tpu.ops.sparse:CooMatrix",
    "csc_matvec": "polara_tpu.ops.sparse:MatmulOperator",
    "row_unblockify": "polara_tpu.ops.scoring:ChunkedTestData",
    "row_blockify": "polara_tpu.ops.scoring:ChunkedTestData",
    "set_diagonal_values": "polara_tpu.ops.similarity:similarity_function",
    # sequential SGD sweeps -> device minibatch training
    "mf_sgd_sweep": "polara_tpu.ops.factorize:mf_train",
    "mf_sgd_sweep_biased": "polara_tpu.ops.factorize:mf_train",
    "generalized_sgd_sweep": "polara_tpu.ops.factorize:mf_train",
    "mf_sgd_boilerplate": "polara_tpu.ops.factorize:mf_train",
    "simple_mf_sgd": "polara_tpu.ops.factorize:mf_train",
    "simple_pmf_sgd": "polara_tpu.ops.factorize:mf_train",
    "sp_kernel_update": "polara_tpu.ops.factorize:KernelOperator",
    "sparse_kernel_update": "polara_tpu.ops.factorize:KernelOperator",
    "kernelized_pmf_sgd": "polara_tpu.models.hybrid:KernelizedPMF",
    "identity": "polara_tpu.ops.factorize:mf_train",
    "adagrad": "polara_tpu.ops.factorize:mf_train",
    "rmsprop": "polara_tpu.ops.factorize:mf_train",
    "adam": "polara_tpu.ops.factorize:mf_train",
    "adanorm": "polara_tpu.ops.factorize:mf_train",
    "gnprop": "polara_tpu.ops.factorize:mf_train",
    "gnpropz": "polara_tpu.ops.factorize:mf_train",
    "trace": "polara_tpu.runtime.timing:track_time",
    # exclusion samplers -> padded device sampling + C++ host path
    "prime_sampler_state": "polara_tpu.ops.samplers:sample_row_wise",
    "sample_fill": "polara_tpu.ops.samplers:sample_row_wise",
    "sample_element_wise": "polara_tpu.ops.samplers:sample_row_wise",
    "mf_random_item_scoring": "polara_tpu.ops.samplers:sampled_scores",
    "jaccard_similarity_weighted_dense":
        "polara_tpu.ops.similarity:jaccard_similarity_weighted",
    "combine_distribute_similarity_data":
        "polara_tpu.preprocessing.features:combine_similarity_data",
    # misc
    "random_chooser": "polara_tpu.evaluation.pipelines:random_grid",
    "join_path": "polara_tpu.models.external.mymedialite:MyMediaLiteWrapper",
    "parse_lines": "polara_tpu.models.external.mymedialite:MyMediaLiteWrapper",
    "WarmStartRecommendationsMixin":
        "polara_tpu.models.external.turi:TuriFactorizationRecommender",
    "ColdStartRecommendationsMixin":
        "polara_tpu.models.external.turi:TuriFactorizationRecommender",
    "MemoryStatus": "polara_tpu.runtime.memory:get_available_memory",
    "platform_free_memory": "polara_tpu.runtime.memory:get_available_memory",
}


def _public_symbols(tree: pathlib.Path):
    pattern = re.compile(r"^(?:class|def)\s+([A-Za-z][A-Za-z0-9_]*)",
                         re.MULTILINE)
    symbols = set()
    for path in tree.rglob("*.py"):
        symbols.update(pattern.findall(path.read_text()))
    return symbols


@pytest.mark.skipif(not REFERENCE.exists(),
                    reason="reference tree not available")
def test_every_reference_symbol_is_covered():
    ref = _public_symbols(REFERENCE)
    ours = _public_symbols(REPO)
    unmapped = sorted(ref - ours - set(SUBSUMED))
    assert not unmapped, (
        f"reference symbols with no same-named equivalent and no "
        f"SUBSUMED entry (update polara_tpu or docs/MIGRATION.md): "
        f"{unmapped}")


def test_subsumed_replacements_exist():
    import importlib
    for symbol, target in SUBSUMED.items():
        module_name, attr = target.split(":")
        module = importlib.import_module(module_name)
        assert hasattr(module, attr), (
            f"SUBSUMED[{symbol!r}] points at missing {target}")
