// mlp_train — the MNIST ladder's native C++ rung ("v3").
//
// Counterpart of the reference's v3.c (484-line C CPU training loop with
// per-op TimingStats): trains the 784-256-10 MLP with SGD + softmax-CE on
// the shared .bin data contract, starting from INITIAL WEIGHTS EXPORTED BY
// THE PYTHON RUNGS (w1.bin/b1.bin/w2.bin/b2.bin, IO layout) so the loss
// trajectory is bit-comparable across rungs — tighter than the reference,
// which only matched the init scheme.
//
// Usage:
//   mlp_train <dir> <epochs> <batch> <lr>
// where <dir> holds X_train.bin [N,784] fp32, y_train.bin [N] int32, and
// the initial weights. Prints per-epoch loss and the reference's 5-phase
// timing table; writes final weights back as w1_out.bin etc.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

using clk = std::chrono::steady_clock;

static double secs(clk::time_point a, clk::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

static std::vector<float> load_f32(const std::string& p, size_t expect) {
  FILE* f = fopen(p.c_str(), "rb");
  if (!f) { fprintf(stderr, "missing %s\n", p.c_str()); exit(1); }
  fseek(f, 0, SEEK_END);
  size_t n = ftell(f) / sizeof(float);
  fseek(f, 0, SEEK_SET);
  if (expect && n != expect) { fprintf(stderr, "%s: %zu elems != %zu\n", p.c_str(), n, expect); exit(1); }
  std::vector<float> v(n);
  if (fread(v.data(), sizeof(float), n, f) != n) { fprintf(stderr, "short read %s\n", p.c_str()); exit(1); }
  fclose(f);
  return v;
}

static std::vector<int32_t> load_i32(const std::string& p) {
  FILE* f = fopen(p.c_str(), "rb");
  if (!f) { fprintf(stderr, "missing %s\n", p.c_str()); exit(1); }
  fseek(f, 0, SEEK_END);
  size_t n = ftell(f) / sizeof(int32_t);
  fseek(f, 0, SEEK_SET);
  std::vector<int32_t> v(n);
  if (fread(v.data(), sizeof(int32_t), n, f) != n) { fprintf(stderr, "short read %s\n", p.c_str()); exit(1); }
  fclose(f);
  return v;
}

static void save_f32(const std::string& p, const float* d, size_t n) {
  FILE* f = fopen(p.c_str(), "wb");
  fwrite(d, sizeof(float), n, f);
  fclose(f);
}

// C[M,N] = A[M,K] @ B[K,N]   (B in IO layout like the python rungs)
static void matmul(const float* A, const float* B, float* C, int M, int K, int N) {
  for (int i = 0; i < M; i++) {
    float* c = C + (size_t)i * N;
    memset(c, 0, sizeof(float) * N);
    const float* a = A + (size_t)i * K;
    for (int k = 0; k < K; k++) {
      float av = a[k];
      const float* b = B + (size_t)k * N;
      for (int j = 0; j < N; j++) c[j] += av * b[j];
    }
  }
}

// C[M,N] = A[K,M]^T @ B[K,N]  (dW = X^T dY)
static void matmul_tn(const float* A, const float* B, float* C, int K, int M, int N) {
  for (int i = 0; i < M; i++) memset(C + (size_t)i * N, 0, sizeof(float) * N);
  for (int k = 0; k < K; k++) {
    const float* a = A + (size_t)k * M;
    const float* b = B + (size_t)k * N;
    for (int i = 0; i < M; i++) {
      float av = a[i];
      float* c = C + (size_t)i * N;
      for (int j = 0; j < N; j++) c[j] += av * b[j];
    }
  }
}

// C[M,K] = A[M,N] @ B[K,N]^T  (dX = dY W^T)
static void matmul_nt(const float* A, const float* B, float* C, int M, int N, int K) {
  for (int i = 0; i < M; i++) {
    const float* a = A + (size_t)i * N;
    float* c = C + (size_t)i * K;
    for (int k = 0; k < K; k++) {
      const float* b = B + (size_t)k * N;
      float s = 0.f;
      for (int j = 0; j < N; j++) s += a[j] * b[j];
      c[k] = s;
    }
  }
}

int main(int argc, char** argv) {
  if (argc < 5) { fprintf(stderr, "usage: mlp_train <dir> <epochs> <batch> <lr>\n"); return 1; }
  std::string dir = argv[1];
  int epochs = atoi(argv[2]), B = atoi(argv[3]);
  float lr = (float)atof(argv[4]);
  const int D = 784, H = 256, C = 10;

  auto X = load_f32(dir + "/X_train.bin", 0);
  auto y = load_i32(dir + "/y_train.bin");
  int N = (int)y.size();
  auto W1 = load_f32(dir + "/w1.bin", (size_t)D * H);
  auto b1 = load_f32(dir + "/b1.bin", H);
  auto W2 = load_f32(dir + "/w2.bin", (size_t)H * C);
  auto b2 = load_f32(dir + "/b2.bin", C);

  std::vector<float> z1((size_t)B * H), a1((size_t)B * H), z2((size_t)B * C);
  std::vector<float> dz2((size_t)B * C), da1((size_t)B * H), dz1((size_t)B * H);
  std::vector<float> dW1((size_t)D * H), dW2((size_t)H * C), db1(H), db2(C);

  double t_data = 0, t_fwd = 0, t_loss = 0, t_bwd = 0, t_upd = 0;
  auto t_all0 = clk::now();
  int steps = N / B;
  for (int ep = 0; ep < epochs; ep++) {
    double ep_loss = 0;
    for (int s = 0; s < steps; s++) {
      auto t0 = clk::now();
      const float* xb = X.data() + (size_t)s * B * D;
      const int32_t* yb = y.data() + (size_t)s * B;
      auto t1 = clk::now(); t_data += secs(t0, t1);

      // forward
      matmul(xb, W1.data(), z1.data(), B, D, H);
      for (int i = 0; i < B; i++)
        for (int j = 0; j < H; j++) {
          float v = z1[(size_t)i * H + j] + b1[j];
          z1[(size_t)i * H + j] = v;
          a1[(size_t)i * H + j] = v > 0 ? v : 0;
        }
      matmul(a1.data(), W2.data(), z2.data(), B, H, C);
      for (int i = 0; i < B; i++)
        for (int j = 0; j < C; j++) z2[(size_t)i * C + j] += b2[j];
      auto t2 = clk::now(); t_fwd += secs(t1, t2);

      // softmax-CE loss + fused grad (p - onehot)/B  [v2.py:119-123 math]
      float loss = 0;
      for (int i = 0; i < B; i++) {
        float* row = z2.data() + (size_t)i * C;
        float m = row[0];
        for (int j = 1; j < C; j++) m = row[j] > m ? row[j] : m;
        float sum = 0;
        for (int j = 0; j < C; j++) sum += expf(row[j] - m);
        float logz = m + logf(sum);
        loss += logz - row[yb[i]];
        for (int j = 0; j < C; j++) {
          float p = expf(row[j] - logz);
          dz2[(size_t)i * C + j] = (p - (j == yb[i] ? 1.f : 0.f)) / B;
        }
      }
      ep_loss += loss / B;
      auto t3 = clk::now(); t_loss += secs(t2, t3);

      // backward: dW2 = a1^T dz2; da1 = dz2 W2^T; dz1 = da1 * relu'(z1); dW1 = x^T dz1
      matmul_tn(a1.data(), dz2.data(), dW2.data(), B, H, C);
      for (int j = 0; j < C; j++) {
        float s2 = 0;
        for (int i = 0; i < B; i++) s2 += dz2[(size_t)i * C + j];
        db2[j] = s2;
      }
      matmul_nt(dz2.data(), W2.data(), da1.data(), B, C, H);
      for (int i = 0; i < B; i++)
        for (int j = 0; j < H; j++)
          dz1[(size_t)i * H + j] = z1[(size_t)i * H + j] > 0 ? da1[(size_t)i * H + j] : 0;
      matmul_tn(xb, dz1.data(), dW1.data(), B, D, H);
      for (int j = 0; j < H; j++) {
        float s1 = 0;
        for (int i = 0; i < B; i++) s1 += dz1[(size_t)i * H + j];
        db1[j] = s1;
      }
      auto t4 = clk::now(); t_bwd += secs(t3, t4);

      // SGD update
      for (size_t k = 0; k < W1.size(); k++) W1[k] -= lr * dW1[k];
      for (int j = 0; j < H; j++) b1[j] -= lr * db1[j];
      for (size_t k = 0; k < W2.size(); k++) W2[k] -= lr * dW2[k];
      for (int j = 0; j < C; j++) b2[j] -= lr * db2[j];
      t_upd += secs(t4, clk::now());
    }
    printf("epoch %d loss %.6f\n", ep, ep_loss / steps);
  }
  double total = secs(t_all0, clk::now());
  double ph = t_data + t_fwd + t_loss + t_bwd + t_upd;
  printf("total_s %.3f\n", total);
  printf("phases data:%.0f%% forward:%.0f%% loss:%.0f%% backward:%.0f%% update:%.0f%%\n",
         100 * t_data / ph, 100 * t_fwd / ph, 100 * t_loss / ph, 100 * t_bwd / ph,
         100 * t_upd / ph);
  save_f32(dir + "/w1_out.bin", W1.data(), W1.size());
  save_f32(dir + "/b1_out.bin", b1.data(), b1.size());
  save_f32(dir + "/w2_out.bin", W2.data(), W2.size());
  save_f32(dir + "/b2_out.bin", b2.data(), b2.size());
  return 0;
}
