"""Reference checkpoint compatibility: a torch ``best_qformer_model.pth``
saved in the reference's schema (training/item_qformer_training.py:178-182)
loads through QFormerInference and reproduces the torch model's outputs."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

torch = pytest.importorskip("torch")

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

add_reference_to_path()

import transformers.modeling_utils as _mu  # noqa: E402
import transformers.pytorch_utils as _pu  # noqa: E402

for _n in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
           "prune_linear_layer"):
    if not hasattr(_mu, _n):
        setattr(_mu, _n, getattr(_pu, _n))


def test_pth_checkpoint_roundtrip(tmp_path):
    from models.qformer_utils import QFormerForItemRepresentation  # oracle

    torch.manual_seed(0)
    num_fields = 5
    tmodel = QFormerForItemRepresentation(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, num_query_tokens=4, field_embedding_dim=48,
        num_fields=num_fields, dropout=0.0,
    )
    tmodel.eval()

    # save in the reference trainer's schema
    ckpt_path = str(tmp_path / "best_qformer_model.pth")
    torch.save(
        {
            "model_state_dict": tmodel.state_dict(),
            "config": tmodel.config,
            "field_names": ["a", "b", "c", "d", "e"],
        },
        ckpt_path,
    )

    from unirec_tpu.inference.qformer_inference import QFormerInference

    inf = QFormerInference(ckpt_path, batch_size=8)
    assert inf.field_names == ["a", "b", "c", "d", "e"]
    assert inf.config.num_query_tokens == 4
    assert inf.config.num_fields == num_fields

    rng = np.random.RandomState(0)
    fields = rng.randn(3, num_fields, 48).astype(np.float32)
    mask = np.ones((3, num_fields), np.float32)
    tokens = inf.query_tokens_from_embeddings(fields, mask)

    with torch.no_grad():
        t_out = tmodel(torch.tensor(fields), torch.tensor(mask))[
            "query_outputs"
        ].numpy()
    # bf16 inference vs fp32 torch: loose tolerance
    np.testing.assert_allclose(tokens, t_out, atol=0.08, rtol=0.1)
    # correlation must be essentially 1
    c = np.corrcoef(tokens.ravel(), t_out.ravel())[0, 1]
    assert c > 0.999
