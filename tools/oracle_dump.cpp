// Parity oracle: drives the UNMODIFIED reference engine (compiled out-of-tree
// from /root/reference) and dumps machine-readable state so the JAX rebuild
// can be diffed trajectory-by-trajectory against it.  This file is test
// harness code only -- it links against the reference, it does not reimplement
// it.
//
// Usage:
//   oracle_dump board <seed>
//       print the 121 raw board ints after InitBoardItems(seed)
//   oracle_dump traj <seed> <steps>
//       InitState(seed, agents 0..3 in corners), then read 4 move ints per
//       step from stdin, Step(), and dump full state per step
//   oracle_dump kicktraj <seed> <steps>
//       same, but all agents get canKick=true first
//   oracle_dump simple <seed> <steps>
//       4 reference SimpleAgents whose public rng members are re-seeded with
//       mt19937_64(seed*7919 + i); per step prints the chosen moves then the
//       post-step state (dead agents act IDLE)

#include <cstdio>
#include <cstdlib>
#include "bboard.hpp"
#include "agents.hpp"

using namespace bboard;

// NOTE: build this file with -ftrivial-auto-var-init=zero (see
// tools/build_oracle.sh).  InitBoardItems' powerup loop can read
// one-past-the-end of its local wood queue (bboard.cpp:365-371, inclusive
// idxSample bound) -- an uninitialized stack read, UB in the reference.  The
// flag makes that read deterministically 0, which is the model the JAX
// replica implements (core/board_gen.py).

static void dumpState(const State& s)
{
    std::printf("{\"board\":[");
    for (int y = 0; y < BOARD_SIZE; y++)
        for (int x = 0; x < BOARD_SIZE; x++)
            std::printf("%d%s", s.board[y][x],
                        (y == BOARD_SIZE - 1 && x == BOARD_SIZE - 1) ? "" : ",");
    std::printf("],\"agents\":[");
    for (int i = 0; i < AGENT_COUNT; i++)
    {
        const AgentInfo& a = s.agents[i];
        std::printf("[%d,%d,%d,%d,%d,%d,%d]%s", a.x, a.y, a.dead ? 1 : 0,
                    a.bombCount, a.maxBombCount, a.bombStrength,
                    a.canKick ? 1 : 0, i == AGENT_COUNT - 1 ? "" : ",");
    }
    std::printf("],\"bombs\":[");
    for (int i = 0; i < s.bombs.count; i++)
    {
        Bomb b = s.bombs[i];
        std::printf("[%d,%d,%d,%d,%d,%d]%s", BMB_POS_X(b), BMB_POS_Y(b),
                    BMB_ID(b), BMB_STRENGTH(b), BMB_TIME(b), BMB_DIR(b),
                    i == s.bombs.count - 1 ? "" : ",");
    }
    std::printf("],\"flames\":[");
    for (int i = 0; i < s.flames.count; i++)
    {
        const Flame& f = s.flames[i];
        std::printf("[%d,%d,%d,%d]%s", f.position.x, f.position.y, f.timeLeft,
                    f.strength, i == s.flames.count - 1 ? "" : ",");
    }
    std::printf("],\"alive\":%d}\n", s.aliveAgents);
}

int main(int argc, char** argv)
{
    if (argc < 3) { std::fprintf(stderr, "usage: see header\n"); return 2; }
    long seed = std::strtol(argv[2], nullptr, 0);

    if (std::string(argv[1]) == "board")
    {
        auto s = std::make_unique<State>();
        InitBoardItems(*s, (int)seed);
        std::printf("[");
        for (int y = 0; y < BOARD_SIZE; y++)
            for (int x = 0; x < BOARD_SIZE; x++)
                std::printf("%d%s", s->board[y][x],
                            (y == BOARD_SIZE - 1 && x == BOARD_SIZE - 1) ? "" : ",");
        std::printf("]\n");
        return 0;
    }

    if (std::string(argv[1]) == "simple")
    {
        int steps = argc > 3 ? std::atoi(argv[3]) : 100;
        auto s = std::make_unique<State>();
        InitBoardItems(*s, (int)seed);
        s->PutAgentsInCorners(0, 1, 2, 3);

        agents::SimpleAgent ag[AGENT_COUNT];
        for (int i = 0; i < AGENT_COUNT; i++)
        {
            ag[i].id = i;
            // Replace the random_device seeding with a reproducible stream
            // (rng is a public member, agents.hpp:56).
            ag[i].rng = std::mt19937_64((unsigned long long)seed * 7919u + i);
        }

        dumpState(*s);
        Move m[AGENT_COUNT];
        for (int t = 0; t < steps; t++)
        {
            for (int i = 0; i < AGENT_COUNT; i++)
                m[i] = s->agents[i].dead ? Move::IDLE : ag[i].act(s.get());
            std::printf("{\"moves\":[%d,%d,%d,%d]}\n", (int)m[0], (int)m[1],
                        (int)m[2], (int)m[3]);
            Step(s.get(), m);
            dumpState(*s);
            if (s->aliveAgents <= 1) break;
        }
        return 0;
    }

    if (std::string(argv[1]) == "enum1" || std::string(argv[1]) == "enumkick")
    {
        // All 6^4 joint moves applied to the same start state: the
        // exhaustive one-step conformance sweep (SURVEY.md hard part (a)).
        // Optionally advance some warmup steps (moves from stdin) first.
        bool kick = std::string(argv[1]) == "enumkick";
        int warm = argc > 3 ? std::atoi(argv[3]) : 0;
        auto base = std::make_unique<State>();
        InitBoardItems(*base, (int)seed);
        base->PutAgentsInCorners(0, 1, 2, 3);
        if (kick)
            for (int i = 0; i < AGENT_COUNT; i++) base->agents[i].canKick = true;
        Move wm[AGENT_COUNT];
        for (int t = 0; t < warm; t++)
        {
            int mv[4];
            if (std::scanf("%d %d %d %d", &mv[0], &mv[1], &mv[2], &mv[3]) != 4)
                break;
            for (int i = 0; i < AGENT_COUNT; i++) wm[i] = (Move)mv[i];
            Step(base.get(), wm);
        }
        dumpState(*base);
        Move m[AGENT_COUNT];
        for (int code = 0; code < 6 * 6 * 6 * 6; code++)
        {
            State s = *base;  // POD copy
            int c = code;
            for (int i = 0; i < AGENT_COUNT; i++) { m[i] = (Move)(c % 6); c /= 6; }
            Step(&s, m);
            dumpState(s);
        }
        return 0;
    }

    if (std::string(argv[1]) == "loadenum2" || std::string(argv[1]) == "loadenum3")
    {
        // 2-step exhaustive sweep over TWO interacting agents on an
        // injected state (the phase-2 bounce-back semantics span
        // consecutive steps; VERDICT r2 item 3).  argv[2]/argv[3] are the
        // two agent ids; all 36x36 (step1, step2) joint-move pairs of
        // those agents are applied (other agents IDLE).  State comes from
        // stdin as whitespace ints: 121 raw board ints, 4x7 agent tuples
        // (x y dead bombCount maxBombCount bombStrength canKick), nbombs +
        // nx6 bomb tuples (x y id strength time dir), nflames + nx4 flame
        // tuples (x y timeLeft strength), aliveAgents.  Echoes the loaded
        // state, then dumps the state after each 2-step sequence (1296).
        // loadenum3 <a> <b> <c>: same state injection, but THREE live
        // agents sweep a pruned 5-move alphabet (IDLE + 4 directions; bombs
        // come pre-planted in the injected state) over two steps --
        // 125 x 125 = 15625 sequences.  Exhausts multi-link chain
        // reversions that cascade through a second displaced agent across
        // a step boundary (step_utility.cpp:62-128), which the pairwise
        // loadenum2 sweep cannot reach.
        bool trio = std::string(argv[1]) == "loadenum3";
        int aa = (int)seed;           // argv[2] reused as agent id a
        int ab = std::atoi(argv[3]);  // agent id b
        int ac3 = trio ? std::atoi(argv[4]) : -1;
        // optional argv[5]: per-agent alphabet size for loadenum3 (5 =
        // IDLE+directions; 6 adds BOMB for plant-interacting chains).
        int nmv = (trio && argc > 5) ? std::atoi(argv[5]) : 5;
        auto base = std::make_unique<State>();
        for (int y = 0; y < BOARD_SIZE; y++)
            for (int x = 0; x < BOARD_SIZE; x++)
                if (std::scanf("%d", &base->board[y][x]) != 1) return 3;
        for (int i = 0; i < AGENT_COUNT; i++)
        {
            AgentInfo& a = base->agents[i];
            int dead, kickf;
            if (std::scanf("%d %d %d %d %d %d %d", &a.x, &a.y, &dead,
                           &a.bombCount, &a.maxBombCount, &a.bombStrength,
                           &kickf) != 7) return 3;
            a.dead = dead != 0;
            a.canKick = kickf != 0;
        }
        int nb;
        if (std::scanf("%d", &nb) != 1) return 3;
        for (int i = 0; i < nb; i++)
        {
            int x, y, id, st, tm, dir;
            if (std::scanf("%d %d %d %d %d %d", &x, &y, &id, &st, &tm, &dir) != 6)
                return 3;
            Bomb b = 0;
            SetBombPosition(b, x, y);
            SetBombID(b, id);
            SetBombStrength(b, st);
            SetBombTime(b, tm);
            SetBombDirection(b, (Direction)dir);
            base->bombs.AddElem(b);
        }
        int nf;
        if (std::scanf("%d", &nf) != 1) return 3;
        for (int i = 0; i < nf; i++)
        {
            Flame f;
            if (std::scanf("%d %d %d %d", &f.position.x, &f.position.y,
                           &f.timeLeft, &f.strength) != 4) return 3;
            base->flames.AddElem(f);
        }
        if (std::scanf("%d", &base->aliveAgents) != 1) return 3;

        dumpState(*base);
        Move m[AGENT_COUNT];
        if (trio)
        {
            int n3 = nmv * nmv * nmv;
            for (int code = 0; code < n3 * n3; code++)
            {
                State s = *base;  // POD copy
                int c1 = code % n3, c2 = code / n3;
                for (int i = 0; i < AGENT_COUNT; i++) m[i] = Move::IDLE;
                m[aa] = (Move)(c1 % nmv); m[ab] = (Move)(c1 / nmv % nmv);
                m[ac3] = (Move)(c1 / (nmv * nmv));
                Step(&s, m);
                m[aa] = (Move)(c2 % nmv); m[ab] = (Move)(c2 / nmv % nmv);
                m[ac3] = (Move)(c2 / (nmv * nmv));
                Step(&s, m);
                dumpState(s);
            }
            return 0;
        }
        for (int code = 0; code < 36 * 36; code++)
        {
            State s = *base;  // POD copy
            int c1 = code % 36, c2 = code / 36;
            for (int i = 0; i < AGENT_COUNT; i++) m[i] = Move::IDLE;
            m[aa] = (Move)(c1 % 6); m[ab] = (Move)(c1 / 6);
            Step(&s, m);
            m[aa] = (Move)(c2 % 6); m[ab] = (Move)(c2 / 6);
            Step(&s, m);
            dumpState(s);
        }
        return 0;
    }

    bool kick = std::string(argv[1]) == "kicktraj";
    int steps = argc > 3 ? std::atoi(argv[3]) : 100;

    auto s = std::make_unique<State>();
    InitBoardItems(*s, (int)seed);
    s->PutAgentsInCorners(0, 1, 2, 3);
    if (kick)
        for (int i = 0; i < AGENT_COUNT; i++) s->agents[i].canKick = true;

    dumpState(*s);
    Move m[AGENT_COUNT];
    for (int t = 0; t < steps; t++)
    {
        int mv[4];
        if (std::scanf("%d %d %d %d", &mv[0], &mv[1], &mv[2], &mv[3]) != 4)
            break;
        for (int i = 0; i < AGENT_COUNT; i++) m[i] = (Move)mv[i];
        Step(s.get(), m);
        dumpState(*s);
        if (s->aliveAgents <= 1) break;
    }
    return 0;
}
