"""Masked LSTM scan vs torch packed-sequence semantics (SURVEY.md §7
'hard parts': final cell state at q_len per direction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dl_vqa_tpu.ops.lstm import bilstm_final_cell, lstm_scan, reverse_valid_prefix

torch = pytest.importorskip("torch")


def _torch_lstm_params(lstm, suffix=""):
    return {
        "w_ih": jnp.asarray(
            getattr(lstm, f"weight_ih_l0{suffix}").detach().numpy().T
        ),
        "w_hh": jnp.asarray(
            getattr(lstm, f"weight_hh_l0{suffix}").detach().numpy().T
        ),
        "b": jnp.asarray(
            (
                getattr(lstm, f"bias_ih_l0{suffix}")
                + getattr(lstm, f"bias_hh_l0{suffix}")
            )
            .detach()
            .numpy()
        ),
    }


def test_reverse_valid_prefix():
    x = jnp.arange(2 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 1)
    lengths = jnp.array([3, 1])
    rev = reverse_valid_prefix(x, lengths)
    # sample 0 (len 3): [2,1,0,...]; sample 1 (len 1): [4,...]
    assert rev[0, :3, 0].tolist() == [2.0, 1.0, 0.0]
    assert rev[1, 0, 0].tolist() == 4.0


@pytest.mark.parametrize("bidirectional", [False, True])
def test_matches_torch_packed_lstm(bidirectional):
    torch.manual_seed(0)
    batch, seq, emb, hid = 5, 9, 12, 16
    lengths = np.array([9, 1, 4, 7, 3], dtype=np.int32)

    lstm = torch.nn.LSTM(emb, hid, num_layers=1, bidirectional=bidirectional)
    x = torch.randn(batch, seq, emb)

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, list(lengths), batch_first=True, enforce_sorted=False
    )
    _, (h_n, c_n) = lstm(packed)
    # reference keeps the CELL state: [D, B, H] -> [B, D*H]
    expected = c_n.transpose(0, 1).flatten(1).detach().numpy()

    x_j = jnp.asarray(x.numpy())
    lengths_j = jnp.asarray(lengths)
    fwd = _torch_lstm_params(lstm)
    if bidirectional:
        bwd = _torch_lstm_params(lstm, "_reverse")
        actual = np.asarray(bilstm_final_cell(x_j, lengths_j, fwd, bwd))
    else:
        _, c = lstm_scan(x_j, lengths_j, fwd)
        actual = np.asarray(c)

    np.testing.assert_allclose(actual, expected, atol=1e-5, rtol=1e-5)


def test_hidden_state_also_matches_torch():
    torch.manual_seed(1)
    batch, seq, emb, hid = 3, 6, 8, 10
    lengths = np.array([6, 2, 5], dtype=np.int32)
    lstm = torch.nn.LSTM(emb, hid)
    x = torch.randn(batch, seq, emb)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, list(lengths), batch_first=True, enforce_sorted=False
    )
    _, (h_n, _) = lstm(packed)
    h_actual, _ = lstm_scan(
        jnp.asarray(x.numpy()), jnp.asarray(lengths), _torch_lstm_params(lstm)
    )
    np.testing.assert_allclose(
        np.asarray(h_actual), h_n[0].detach().numpy(), atol=1e-5, rtol=1e-5
    )


def test_pad_positions_do_not_affect_state():
    import jax

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "w_ih": jax.random.normal(k1, (4, 32)) * 0.1,
        "w_hh": jax.random.normal(k2, (8, 32)) * 0.1,
        "b": jnp.zeros(32),
    }
    x = jax.random.normal(k3, (2, 5, 4))
    lengths = jnp.array([3, 5])
    _, c1 = lstm_scan(x, lengths, params)
    # Corrupt the padding region of sample 0; state must not change.
    x_corrupt = x.at[0, 3:].set(999.0)
    _, c2 = lstm_scan(x_corrupt, lengths, params)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=0, rtol=0)
