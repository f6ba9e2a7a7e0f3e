"""Reference-semantics oracle for parity testing.

An independent, deliberately *literal* implementation of the DX-VAE recurrence
(torch, per-sample Python loops, explicit edge sets, variable-width message
windows) used to validate the dense/masked JAX implementation.  It follows the
behavior documented in SURVEY.md §2.2/§3 — asynchronous GRU message passing
with gated-sum aggregation, the decoder's propagate cadence, the loss
decomposition — not the reference's code structure (no DGL, no nn.Module,
edges are plain Python sets).

Weights are injected from the JAX pytree so both implementations compute the
same function if and only if the math matches.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as tF


def _t(a):
    return torch.from_numpy(np.asarray(a)).float()


class TorchOracle:
    """Evaluates encode / decode / loss with reference semantics."""

    N = 7
    SIZE_X0 = 23

    def __init__(self, params):
        # params: the JAX pytree converted to numpy (same names as init_params)
        p = {k: v for k, v in params.items()}
        self.p = {}
        for name, val in p.items():
            if isinstance(val, list):
                self.p[name] = [{kk: _t(vv) for kk, vv in layer.items()} for layer in val]
            else:
                self.p[name] = {kk: _t(vv) for kk, vv in val.items()}
        self.H = self.p["h_to_mu"]["w"].shape[1]

    # -- primitive applies -------------------------------------------------
    def _linear(self, lp, x):
        y = x @ lp["w"].T
        return y + lp["b"] if "b" in lp else y

    def _mlp(self, layers, x):
        for i, lp in enumerate(layers):
            x = self._linear(lp, x)
            if i + 1 < len(layers):
                x = torch.relu(x)
        return x

    def _gru(self, gp, x, h):
        gi = x @ gp["w_ih"].T + gp["b_ih"]
        gh = h @ gp["w_hh"].T + gp["b_hh"]
        i_r, i_z, i_n = gi.chunk(3, dim=-1)
        h_r, h_z, h_n = gh.chunk(3, dim=-1)
        r = torch.sigmoid(i_r + h_r)
        z = torch.sigmoid(i_z + h_z)
        n = torch.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h

    # -- message passing (literal: per-sample, variable windows) ------------
    def _propagate(self, X, edges, hidden, v, h_in=None, encode=False):
        """edges: list (len B) of sets of (src, dst). hidden: list[B][7] of (H,) or None."""
        B = X.shape[0]
        window = list(range(v + 1, self.N)) if encode else list(range(v - 1, -1, -1))
        if h_in is None:
            rows = []
            for bi in range(B):
                slots = []
                for x_node in window:
                    fore = hidden[bi][x_node] if (x_node, v) in edges[bi] else torch.zeros(self.H)
                    back = hidden[bi][x_node] if (v, x_node) in edges[bi] else torch.zeros(self.H)
                    slots.append(torch.cat([fore, back]))
                rows.append(torch.stack(slots) if slots else torch.zeros(0, 2 * self.H))
            h_in_rows = []
            for bi in range(B):
                cat = rows[bi]
                g = torch.sigmoid(self._linear(self.p["gate"], cat))
                m = self._linear(self.p["mapper"], cat)
                h_in_rows.append((g * m).sum(0))
            h_in = torch.stack(h_in_rows)
        side = "enc" if encode else "dec"
        if v == 0:
            hv = self._gru(self.p[f"{side}_rooter"], X[:, 0, : self.SIZE_X0], h_in)
        else:
            hv = self._gru(self.p[f"{side}_combiner"], X[:, v], h_in)
            x_loop = torch.stack(
                [X[bi, v] if (v, v) in edges[bi] else torch.zeros_like(X[bi, v]) for bi in range(B)]
            )
            hv = self._gru(self.p[f"{side}_looper"], x_loop, hv)
        for bi in range(B):
            hidden[bi][v] = hv[bi]
        return hv

    @staticmethod
    def _edges_from_adj(adj):
        out = []
        for a in adj:
            out.append({(i, j) for i in range(7) for j in range(7) if a[i, j] > 0.5})
        return out

    # -- encoder -------------------------------------------------------------
    def encode(self, X, adj):
        X = _t(X)
        edges = self._edges_from_adj(np.asarray(adj))
        B = X.shape[0]
        hidden = [[None] * self.N for _ in range(B)]
        self._propagate(X, edges, hidden, self.N - 1, torch.zeros(B, self.H), encode=True)
        for v in range(self.N - 2, -1, -1):
            self._propagate(X, edges, hidden, v, encode=True)
        h0 = torch.stack([hidden[bi][0] for bi in range(B)])
        mu = self._linear(self.p["h_to_mu"], h0)
        std = tF.softplus(self._linear(self.p["h_to_std"], h0))
        return mu, std, hidden

    # -- teacher-forced loss ---------------------------------------------------
    def loss(self, z, X_true, params_true, adj_true, w_env=2.0, w_frq=5.0, w_kld=0.01,
             mu=None, std=None):
        X_true = _t(X_true)
        params_true = torch.from_numpy(np.asarray(params_true)).long()
        adj = _t(adj_true)
        z = _t(z)
        B = z.shape[0]

        h_init = torch.tanh(self._linear(self.p["z_to_h"], z))
        x0_pred = self._mlp(self.p["h_to_x0"], h_init)

        hidden = [[None] * self.N for _ in range(B)]
        edges = [set() for _ in range(B)]
        self._propagate(X_true, edges, hidden, 0, h_init)

        x0_true = X_true[:, 0]
        p0_true = params_true[:, 0]
        bce = lambda lo, ta: tF.binary_cross_entropy_with_logits(lo, ta, reduction="none")
        ce = lambda lo, ta: tF.cross_entropy(lo, ta, reduction="none")
        mse = lambda a, b_: (a - b_) ** 2

        loss_x0 = (
            mse(x0_pred[:, :8] * w_env, x0_true[:, :8] * w_env).mean(0).sum()
            + mse(x0_pred[:, 8] * w_frq, x0_true[:, 8] * w_frq).mean()
            + mse(x0_pred[:, 9:15], x0_true[:, 9:15]).mean(0).sum()
            + bce(x0_pred[:, 15:17], x0_true[:, 15:17]).mean(0).sum()
            + ce(x0_pred[:, 17:23], p0_true[:, 17]).mean()
            + ce(x0_pred[:, 23:], p0_true[:, 18]).mean()
        )

        loss_xi = torch.zeros(())
        loss_e = torch.zeros(())
        for vi in range(1, self.N):
            hg = torch.stack([hidden[bi][vi - 1] for bi in range(B)])
            xi_pred = self._mlp(self.p["h_to_x"], hg)
            xi_true = X_true[:, vi]
            pi_true = params_true[:, vi]
            loss_xi = loss_xi + (
                mse(xi_pred[:, :9] * w_env, xi_true[:, :9] * w_env).mean(0).sum()
                + mse(xi_pred[:, 9] * w_frq, xi_true[:, 9] * w_frq).mean()
                + mse(xi_pred[:, 10:18], xi_true[:, 10:18]).mean(0).sum()
                + bce(xi_pred[:, 18], xi_true[:, 18]).mean()
                + ce(xi_pred[:, 19:23], pi_true[:, 19]).mean()
                + ce(xi_pred[:, 23:27], pi_true[:, 20]).mean()
            )
            hi = self._propagate(X_true, edges, hidden, vi)

            self_logit = self._mlp(self.p["h_to_edge_self"], hi)
            self_true = adj[:, vi, vi].unsqueeze(1)
            loss_e = loss_e + bce(self_logit, self_true).mean()
            for bi in range(B):
                if adj[bi, vi, vi] > 0.5:
                    edges[bi].add((vi, vi))
            hi = self._propagate(X_true, edges, hidden, vi)

            for vj in range(vi - 1, -1, -1):
                hj = torch.stack([hidden[bi][vj] for bi in range(B)])
                e_logit = self._mlp(self.p["h_to_edge"], torch.cat([hi, hj], -1))
                e_true = torch.stack([adj[:, vj, vi], adj[:, vi, vj]], -1)
                loss_e = loss_e + bce(e_logit, e_true).mean(0).sum()
                for bi in range(B):
                    if adj[bi, vj, vi] > 0.5:
                        edges[bi].add((vj, vi))
                    if adj[bi, vi, vj] > 0.5:
                        edges[bi].add((vi, vj))
                hi = self._propagate(X_true, edges, hidden, vi)

        if mu is None:
            kld = torch.zeros(())
        else:
            mu, std = _t(mu), _t(std)
            kld = (torch.log(std) + (1 + mu**2) / (2 * std**2) - 0.5).mean(0).sum()
        kld_w = kld * w_kld
        total = loss_x0 + loss_xi + loss_e + kld_w
        return total, (loss_x0, loss_xi, loss_e, kld_w), hidden

    # -- generation decode -------------------------------------------------------
    def decode(self, z, strict_parity=True):
        z = _t(z)
        B = z.shape[0]
        h_init = torch.tanh(self._linear(self.p["z_to_h"], z))
        x0_plus = self._mlp(self.p["h_to_x0"], h_init)
        x0, p0 = self._reg_x0(x0_plus)
        X = torch.zeros(B, self.N, 27)
        P = torch.zeros(B, self.N, 21)
        X[:, 0] = x0
        P[:, 0] = p0
        hidden = [[None] * self.N for _ in range(B)]
        edges = [set() for _ in range(B)]
        self._propagate(X, edges, hidden, 0, h_init)

        adj = torch.zeros(B, self.N, self.N)
        for vi in range(1, self.N):
            hg = torch.stack([hidden[bi][vi - 1] for bi in range(B)])
            xi, pi = self._reg_xi(self._mlp(self.p["h_to_x"], hg), strict_parity)
            X[:, vi] = xi
            P[:, vi] = pi
            hi = self._propagate(X, edges, hidden, vi)
            s = torch.sigmoid(self._mlp(self.p["h_to_edge_self"], hi))[:, 0] > 0.5
            for bi in range(B):
                if s[bi]:
                    edges[bi].add((vi, vi))
                    adj[bi, vi, vi] = 1
            hi = self._propagate(X, edges, hidden, vi)
            for vj in range(vi - 1, -1, -1):
                hj = torch.stack([hidden[bi][vj] for bi in range(B)])
                e = torch.sigmoid(self._mlp(self.p["h_to_edge"], torch.cat([hi, hj], -1))) > 0.5
                for bi in range(B):
                    if e[bi, 0]:
                        edges[bi].add((vj, vi))
                        adj[bi, vj, vi] = 1
                    if e[bi, 1]:
                        edges[bi].add((vi, vj))
                        adj[bi, vi, vj] = 1
                hi = self._propagate(X, edges, hidden, vi)
        return X.numpy(), P.numpy(), adj.numpy()

    # -- quantizers (literal per reference grids) --------------------------------
    @staticmethod
    def _q_lin(x, scale):
        p = torch.clamp(torch.round(x * scale), 0, scale)
        return p / scale, p

    @staticmethod
    def _q_log(x, scale):
        ls = torch.log(torch.tensor(float(scale + 1)))
        p = torch.clamp(torch.round(torch.exp(x * ls) - 1), 0, scale)
        return torch.log(p + 1) / ls, p

    def _reg_x0(self, x0_plus):
        B = x0_plus.shape[0]
        x0 = torch.zeros(B, 27)
        p0 = torch.zeros(B, 21)
        x0[:, :23] = x0_plus[:, :23]
        x0[:, :8], p0[:, :8] = self._q_lin(x0[:, :8], 99)
        x0[:, 8], p0[:, 8] = self._q_lin(x0[:, 8], 48)
        x0[:, 9:13], p0[:, 9:13] = self._q_lin(x0[:, 9:13], 99)
        x0[:, 13:15], p0[:, 13:15] = self._q_lin(x0[:, 13:15], 7)
        b = torch.round(torch.sigmoid(x0[:, 15:17]))
        x0[:, 15:17], p0[:, 15:17] = b, b
        lfw = torch.argmax(x0[:, 17:23].clone(), dim=1)
        x0[:, 17:23] = tF.one_hot(lfw, 6).float()
        p0[:, 17] = lfw
        p0[:, 18] = torch.argmax(x0_plus[:, 23:], dim=1)
        return x0, p0

    def _reg_xi(self, xi, strict_parity=True):
        xi = xi.clone()
        B = xi.shape[0]
        pi = torch.zeros(B, 21)
        xi[:, :9], pi[:, :9] = self._q_lin(xi[:, :9], 99)
        xi[:, 11], pi[:, 11] = self._q_lin(xi[:, 11], 14)
        xi[:, 12:15], pi[:, 12:15] = self._q_lin(xi[:, 12:15], 99)
        xi[:, 15], pi[:, 15] = self._q_lin(xi[:, 15], 3)
        xi[:, 16:18], pi[:, 16:18] = self._q_lin(xi[:, 16:18], 7)
        b = torch.round(torch.sigmoid(xi[:, 18]))
        xi[:, 18], pi[:, 18] = b, b
        lc = torch.argmax(xi[:, 19:23].clone(), dim=1)
        xi[:, 19:23] = tF.one_hot(lc, 4).float()
        pi[:, 19] = lc
        rc_slice = xi[:, 23:26] if strict_parity else xi[:, 23:27]
        rc = torch.argmax(rc_slice.clone(), dim=1)
        xi[:, 23:27] = tF.one_hot(rc, 4).float()
        pi[:, 20] = rc
        for bi in range(B):
            if pi[bi, 18] == 0:
                xi[bi, 9], pi[bi, 9] = self._q_log(xi[bi, 9], 31)
                xi[bi, 10], pi[bi, 10] = self._q_log(xi[bi, 10], 99)
            else:
                xi[bi, 9], pi[bi, 9] = self._q_lin(xi[bi, 9], 3)
                xi[bi, 10], pi[bi, 10] = self._q_lin(xi[bi, 10], 99)
        return xi, pi
