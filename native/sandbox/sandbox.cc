// mmt_sandbox — resource-limited process jail for RL reward code execution.
//
// Native parity item with the reference's nsjail wrapper
// (/root/reference/src/multimeditron/tools/__init__.py:10-110, which shells
// out to an nsjail binary built in docker/Dockerfile.verl:70-78). This is a
// portable C++ equivalent: fork + setsid + rlimits (+ optional new
// namespaces where permitted) + wall-clock watchdog with process-group
// SIGKILL.
//
// Usage:
//   mmt_sandbox [--timeout SEC] [--cpu SEC] [--mem MB] [--fsize MB]
//               [--nproc N] [--chdir DIR] [--unshare] -- cmd [args...]
//
// The payload (e.g. python code) is delivered on stdin by the caller.
// Exit codes: child's exit code; 124 on timeout; 125 on sandbox error.

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <sched.h>
#include <signal.h>
#include <string>
#include <sys/resource.h>
#include <sys/time.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>
#include <vector>

namespace {

struct Options {
  int timeout_sec = 10;
  int cpu_sec = 10;
  long mem_mb = 512;
  long fsize_mb = 16;
  int nproc = 32;
  const char* chdir_path = nullptr;
  bool unshare_ns = false;
  std::vector<char*> argv;
};

void set_limit(int resource, rlim_t value) {
  struct rlimit lim = {value, value};
  // Best effort: a sandbox refusing to start is worse than a slightly
  // looser limit when the hard cap is below our request.
  if (setrlimit(resource, &lim) != 0) {
    struct rlimit cur;
    if (getrlimit(resource, &cur) == 0 && value < cur.rlim_max) {
      cur.rlim_cur = value;
      setrlimit(resource, &cur);
    }
  }
}

volatile sig_atomic_t g_timed_out = 0;
pid_t g_child = -1;

void on_alarm(int) {
  g_timed_out = 1;
  if (g_child > 0) {
    kill(-g_child, SIGKILL);  // whole process group
  }
}

int parse_args(int argc, char** argv, Options* opts) {
  int i = 1;
  for (; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg == "--") {
      ++i;
      break;
    } else if (arg == "--timeout" && i + 1 < argc) {
      opts->timeout_sec = atoi(argv[++i]);
    } else if (arg == "--cpu" && i + 1 < argc) {
      opts->cpu_sec = atoi(argv[++i]);
    } else if (arg == "--mem" && i + 1 < argc) {
      opts->mem_mb = atol(argv[++i]);
    } else if (arg == "--fsize" && i + 1 < argc) {
      opts->fsize_mb = atol(argv[++i]);
    } else if (arg == "--nproc" && i + 1 < argc) {
      opts->nproc = atoi(argv[++i]);
    } else if (arg == "--chdir" && i + 1 < argc) {
      opts->chdir_path = argv[++i];
    } else if (arg == "--unshare") {
      opts->unshare_ns = true;
    } else {
      fprintf(stderr, "mmt_sandbox: unknown option %s\n", arg.c_str());
      return -1;
    }
  }
  for (; i < argc; ++i) {
    opts->argv.push_back(argv[i]);
  }
  if (opts->argv.empty()) {
    fprintf(stderr, "mmt_sandbox: no command given (use -- cmd ...)\n");
    return -1;
  }
  opts->argv.push_back(nullptr);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  Options opts;
  if (parse_args(argc, argv, &opts) != 0) return 125;

  g_child = fork();
  if (g_child < 0) {
    perror("mmt_sandbox: fork");
    return 125;
  }

  if (g_child == 0) {
    // Child: own session + process group so the watchdog can kill the tree.
    setsid();
    if (opts.unshare_ns) {
      // Best-effort namespace isolation (needs privileges; ignore failure).
      unshare(CLONE_NEWNET | CLONE_NEWPID | CLONE_NEWNS);
    }
    if (opts.chdir_path && chdir(opts.chdir_path) != 0) {
      perror("mmt_sandbox: chdir");
      _exit(125);
    }
    set_limit(RLIMIT_CPU, (rlim_t)opts.cpu_sec);
    set_limit(RLIMIT_AS, (rlim_t)opts.mem_mb * 1024 * 1024);
    set_limit(RLIMIT_FSIZE, (rlim_t)opts.fsize_mb * 1024 * 1024);
    set_limit(RLIMIT_NPROC, (rlim_t)opts.nproc);
    set_limit(RLIMIT_CORE, 0);
    execvp(opts.argv[0], opts.argv.data());
    perror("mmt_sandbox: execvp");
    _exit(125);
  }

  // Parent: wall-clock watchdog.
  struct sigaction sa = {};
  sa.sa_handler = on_alarm;
  sigaction(SIGALRM, &sa, nullptr);
  alarm((unsigned)opts.timeout_sec);

  int status = 0;
  while (waitpid(g_child, &status, 0) < 0) {
    if (errno != EINTR) {
      perror("mmt_sandbox: waitpid");
      return 125;
    }
    if (g_timed_out) {
      // keep waiting for the killed child to be reaped
      continue;
    }
  }
  alarm(0);
  if (g_timed_out) return 124;
  if (WIFEXITED(status)) return WEXITSTATUS(status);
  if (WIFSIGNALED(status)) return 128 + WTERMSIG(status);
  return 125;
}
