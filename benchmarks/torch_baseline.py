"""Reference-equivalent baseline: exact GP regression in torch (CPU, f64),
same data/objective/optimizer as the reference's Pyro path (gpr.py:170-255):
ARD-RBF interval-constrained kernel, Adam on the exact MLL, 250 iters,
dense prediction over the full 128x128 grid."""
import numpy as np, torch, time

img = np.load('/root/reference/expdata/spiral_s_00010_2019.npy')
vals, counts = np.unique(img, return_counts=True)
R = img.copy(); R[R == vals[np.argmax(counts)]] = np.nan
R = (R - np.nanmin(R)) / (np.nanmax(R) - np.nanmin(R))
c1, c2 = np.mgrid[0:128:1.0, 0:128:1.0]
X_all = np.stack([c1, c2], -1).reshape(-1, 2)
y_all = R.flatten()
obs = ~np.isnan(y_all)
X = torch.tensor(X_all[obs]); y = torch.tensor(y_all[obs])
Xt = torch.tensor(X_all)
print("n =", X.shape[0], "n_test =", Xt.shape[0])

lo, hi = 0.0, 64.0
u_ls = torch.full((2,), -2.197, dtype=torch.float64, requires_grad=True)  # ls ~ 6.4
u_var = torch.zeros((), dtype=torch.float64, requires_grad=True)
u_noise = torch.full((), 0.5413, dtype=torch.float64, requires_grad=True)

def constrain():
    ls = lo + (hi - lo) * torch.sigmoid(u_ls)
    var = 1e-4 + (10 - 1e-4) * torch.sigmoid(u_var)
    noise = torch.nn.functional.softplus(u_noise)
    return ls, var, noise

def nll():
    ls, var, noise = constrain()
    Xs = X / ls
    d2 = torch.cdist(Xs, Xs).pow(2)
    K = var * torch.exp(-0.5 * d2) + (noise + 1e-5) * torch.eye(len(X), dtype=torch.float64)
    L = torch.linalg.cholesky(K)
    alpha = torch.cholesky_solve(y[:, None], L)
    return 0.5 * (y @ alpha[:, 0]) + torch.log(torch.diagonal(L)).sum()

opt = torch.optim.Adam([u_ls, u_var, u_noise], lr=0.05)
t0 = time.time()
for i in range(250):
    opt.zero_grad(); loss = nll(); loss.backward(); opt.step()
t_train = time.time() - t0
t0 = time.time()
with torch.no_grad():
    ls, var, noise = constrain()
    Xs, Xts = X / ls, Xt / ls
    K = var * torch.exp(-0.5 * torch.cdist(Xs, Xs).pow(2)) + (noise + 1e-5) * torch.eye(len(X), dtype=torch.float64)
    L = torch.linalg.cholesky(K)
    alpha = torch.cholesky_solve(y[:, None], L)
    mean_l, sd_l = [], []
    for i in range(0, len(Xt), 4096):
        Ks = var * torch.exp(-0.5 * torch.cdist(Xts[i:i+4096], Xs).pow(2))
        m = Ks @ alpha[:, 0]
        V = torch.linalg.solve_triangular(L, Ks.T, upper=False)
        v = var - (V * V).sum(0) + noise
        mean_l.append(m); sd_l.append(v.clamp_min(0).sqrt())
    mean = torch.cat(mean_l).reshape(128, 128).numpy()
t_pred = time.time() - t0
rmse = np.sqrt(np.nanmean((mean - R) ** 2))
print("train_s %.2f predict_s %.2f total_s %.2f rmse %.4f ls %s noise %.5f" % (
    t_train, t_pred, t_train + t_pred, rmse,
    np.round(constrain()[0].detach().numpy(), 3), constrain()[2].item()))
