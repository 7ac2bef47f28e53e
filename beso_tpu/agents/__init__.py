from beso_tpu.agents.policy import PolicyConfig, PolicyState, policy_predict, policy_reset
from beso_tpu.agents.beso_agent import BesoAgent, BesoAgentConfig
