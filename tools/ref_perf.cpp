// Benchmark harness over the UNMODIFIED reference at /root/reference.
//
// Replicates the protocol of unit_test/bboard/performance_test.cpp:52-112
// (10 rounds; threaded mode: THREAD_COUNT independent envs each stepping up
// to 1000 times with a join barrier; report totalSteps/(t/100ms)) without
// the catch.hpp dependency, so the reference's checked-in benchmark can be
// run on THIS host for an apples-to-apples baseline in both policy configs:
// SimpleAgent (the hardcoded policy, performance_test.cpp:38) and
// HarmlessAgent (the policy behind the published README.md:99 figure).
//
// Usage: ref_perf [simple|harmless] [threads]

#include <chrono>
#include <cstring>
#include <future>
#include <iostream>
#include <thread>
#include <vector>

#include "bboard.hpp"
#include "agents.hpp"

template <typename AgentT>
void runEnv(std::promise<int>&& steps, int times)
{
    AgentT a;
    bboard::Environment env;
    env.MakeGame({&a, &a, &a, &a});
    for (int i = 0; i < times && !env.IsDone(); i++)
    {
        env.Step();
    }
    steps.set_value(env.GetState().timeStep);
}

template <typename AgentT>
double bench(int threadCount, const char* name)
{
    const int times = 1000;
    double t = 0;
    long totalSteps = 0;

    for (int r = 0; r < 10; r++)
    {
        std::vector<std::thread> threads(threadCount);
        std::vector<std::promise<int>> p(threadCount);
        std::vector<std::future<int>> f(threadCount);

        auto t1 = std::chrono::high_resolution_clock::now();
        for (int i = 0; i < threadCount; i++)
        {
            f[i] = p[i].get_future();
            threads[i] = std::thread(
                runEnv<AgentT>, std::move(p[i]), times);
        }
        for (int i = 0; i < threadCount; i++)
        {
            threads[i].join();
            totalSteps += f[i].get();
        }
        std::chrono::duration<double, std::milli> total =
            std::chrono::high_resolution_clock::now() - t1;
        t += total.count();
    }
    t /= 10;
    totalSteps /= 10;

    double perSec = totalSteps / (t / 1000.0);
    std::cout << name << " threads=" << threadCount
              << " steps_per_100ms=" << (long)(totalSteps / (t / 100.0))
              << " steps_per_s=" << (long)perSec << std::endl;
    return perSec;
}

int main(int argc, char** argv)
{
    const char* mode = argc > 1 ? argv[1] : "simple";
    int threads = argc > 2 ? std::atoi(argv[2]) : 4;
    if (!std::strcmp(mode, "simple"))
        bench<agents::SimpleAgent>(threads, "SimpleAgent");
    else
        bench<agents::HarmlessAgent>(threads, "HarmlessAgent");
    return 0;
}
