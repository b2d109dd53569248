from .mcts import MCTSConfig, SearchResults, random_oracle, rollout_oracle, search
